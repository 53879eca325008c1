package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated query names (local iteration only)
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        Tuning.adaptiveShufflePartitions(sfDir, cpus.toInt))
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
        Tuning.advisoryPartitionBytes)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.TopK.installAll(spark) // strategy + rank-limit rewrite, the library default
    new java.io.File(outDir).mkdirs()
    // Failed queries are recorded loudly in _errors.json beside the oracle
    // dump (not just stderr): an errored query must be distinguishable from
    // an unregistered one in the correctness artifact — in r8 a mass reader
    // failure surfaced only in BENCH's error list because Verify's rc stayed
    // 0 and the driver's CORRECTNESS simply omitted the rows.
    // The exit code deliberately STAYS 0 on per-query failures: the driver
    // must still receive the partial parquet dump + oracle_sql.json to
    // grade the queries that ran — a nonzero rc would risk zeroing the
    // whole round's correctness instead of recording a partial one.
    // _errors.json (and the stderr summary below) is the failure signal.
    val errs = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
        errs(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(500)
      }
      finally spark.catalog.clearCache() // per-query cache isolation
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errJson = errs.map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/_errors.json"), errJson)
    if (errs.nonEmpty)
      System.err.println(s"[verify] ${errs.size} queries FAILED: ${errs.keys.mkString(", ")}")
    spark.stop()
  }
}
