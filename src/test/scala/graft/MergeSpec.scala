package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.operators.Merge

/** merge_upsert semantics + the reference's core claim: idempotence
  * ("safe to run full sync anytime, no duplicates", CLAUDE.md:68).
  */
class MergeSpec extends SparkTestBase {
  import spark.implicits._

  test("upsert updates matched keys, keeps unmatched, inserts new") {
    val target = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val source = Seq((2L, "B"), (4L, "D")).toDF("id", "v")
    val out = Merge.mergeUpsert(target, source, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "a"), (2L, "B"), (3L, "c"), (4L, "D")))
  }

  test("upsert is idempotent: merge(merge(t,s),s) == merge(t,s)") {
    val gen = Gen.listOfN(20, Gen.zip(Gen.choose(0L, 9L), Gen.alphaStr.map(_.take(4))))
    val prop = Prop.forAll(gen, gen) { (t, s) =>
      // unique pks per side (the reference's tables enforce pk uniqueness)
      val td = t.distinctBy(_._1).toDF("id", "v")
      val sd = s.distinctBy(_._1).toDF("id", "v")
      val once = Merge.mergeUpsert(td, sd, Seq("id"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      val twice = Merge.mergeUpsert(Merge.mergeUpsert(td, sd, Seq("id")), sd, Seq("id"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      once == twice
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("applyCdc round-trips snapshotDiff: apply(base, diff(base, next)) == next") {
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")
    // next exercises all four classes: 1 deleted, 2 updated, 3/4 unchanged,
    // 5 inserted
    val next = Seq((2L, "B"), (3L, "c"), (4L, "d"), (5L, "E")).toDF("id", "v")
    val diff = Merge.snapshotDiff(base, next, Seq("id"))
    val classes = diff.collect()
      .map(r => r.getAs[Long]("id") -> r.getAs[String]("change_type")).toMap
    assert(classes == Map(1L -> "deleted", 2L -> "updated", 3L -> "unchanged",
      4L -> "unchanged", 5L -> "inserted"))
    val applied = Merge.applyCdc(base,
        diff.where(col("change_type") =!= "unchanged"), Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(applied == Set((2L, "B"), (3L, "c"), (4L, "d"), (5L, "E")))
    // the full (unfiltered) changelog applies to the same state — unchanged
    // rows carry new_* equal to old, so filtering them is an optimization,
    // not a correctness requirement
    val appliedAll = Merge.applyCdc(base, diff, Seq("id"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(appliedAll == applied)
  }

  test("schema evolution pads missing columns with NULL") {
    val existing = Seq((1L, 1.0)).toDF("id", "v")
    val batch = Seq((2L, 2.0, "x")).toDF("id", "v", "extra")
    val out = Merge.schemaEvolve(existing, batch)
    assert(out.columns.toSeq == Seq("id", "v", "extra"))
    val byId = out.collect().map(r => r.getLong(0) -> r).toMap
    assert(byId(1L).isNullAt(2) && byId(2L).getString(2) == "x")
  }

  test("pk uniqueness invariant holds after upsert (dbt unique test analog)") {
    val target = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val source = Seq((2L, "B"), (2L, "B2")).toDF("id", "v").dropDuplicates("id")
    val out = Merge.mergeUpsert(target, source, Seq("id"))
    val dupes = out.groupBy("id").count().where(col("count") > 1).count()
    assert(dupes == 0)
  }
}
