package graft

import org.apache.spark.sql.functions._
import graft.functions.WordShingles.{word_grams, word_shingles}

/** Exact-parity pin for the native [[graft.functions.WordShingles]]
  * expression against the HOF forms it replaced (nested zip_with-of-slices +
  * array_distinct in Dedup.shinglesCol; plain zip_with in text_repetition's
  * 2-grams): same elements, same order, same empty/NULL edge behavior.
  */
class WordShinglesSpec extends SparkTestBase {
  import spark.implicits._

  private def hofShingles3(tokens: org.apache.spark.sql.Column) = {
    val n = size(tokens) - 2
    val joined = zip_with(
      zip_with(slice(tokens, lit(1), n), slice(tokens, lit(2), n),
        (x, y) => concat(x, lit(" "), y)),
      slice(tokens, lit(3), n),
      (xy, z) => concat(xy, lit(" "), z))
    when(size(tokens) >= 3, array_distinct(joined))
      .otherwise(array().cast("array<string>"))
  }

  private def hofGrams2(tokens: org.apache.spark.sql.Column) =
    zip_with(
      slice(tokens, lit(1), size(tokens) - 1),
      slice(tokens, lit(2), size(tokens) - 1),
      (a, b) => concat(a, lit(" "), b))

  test("word_shingles(k=3) ≡ the zip_with+array_distinct HOF on a fuzzed corpus") {
    // deterministic fuzz: repeated tokens (distinct pressure), short docs
    // (< 3 tokens), single-char and empty-string tokens
    val docs = (0 until 500).map { i =>
      val vocab = Seq("a", "bb", "c", "dd", "", "e")
      val len = i % 7
      (0 until len).map(j => vocab((i * 31 + j * 17) % vocab.size)).mkString(" ")
    }.toDF("text")
    val toks = split(lower(col("text")), " ")
    val both = docs.select(
      word_shingles(toks, 3).as("native"),
      hofShingles3(toks).as("hof"))
    assert(both.where(not(col("native") <=> col("hof"))).count() == 0)
  }

  test("word_grams(k=2) ≡ the plain zip_with HOF (multiplicities and order kept)") {
    val docs = Seq("x y x y x", "solo", "a a a a", "p q", "").toDF("text")
    val toks = split(col("text"), " ")
    val both = docs.select(
      word_grams(toks, 2).as("native"),
      hofGrams2(toks).as("hof"))
    assert(both.where(not(col("native") <=> col("hof"))).count() == 0)
    // multiplicities really are kept
    val grams = docs.select(word_grams(toks, 2).as("g"))
      .where(size(col("g")) === 4).select(explode(col("g"))).collect()
    assert(grams.length == 4) // "x y x y x" -> 4 grams incl. duplicates
  }

  test("null tokens poison their gram; null array propagates") {
    val df = spark.sql(
      "SELECT array('a', CAST(NULL AS STRING), 'b', 'c') AS toks " +
        "UNION ALL SELECT CAST(NULL AS ARRAY<STRING>)")
    // the library call sites wrap in coalesce(-, array()) — the historical
    // when/otherwise wrapper mapped a NULL token array to the empty set
    val out = df.select(
      coalesce(word_shingles(col("toks"), 3), array().cast("array<string>")).as("native"),
      hofShingles3(col("toks")).as("hof"))
    assert(out.where(not(col("native") <=> col("hof"))).count() == 0)
    // the bare expression null-propagates like any unary
    assert(df.where(col("toks").isNull)
      .select(word_shingles(col("toks"), 3)).collect().head.isNullAt(0))
  }
}
