package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.models.RefMarts

/** Hand-computed semantics for the nine r17 full-fidelity reference marts
  * (value-level truth is the DuckDB gate; these pin the branchy semantics a
  * hash compare can't explain when it breaks: gender_clean branches, topic
  * battery multi-matches, state lookup misses, keyword `\b` traps).
  */
class RefMartsSpec extends SparkTestBase {
  import spark.implicits._

  private def eventsDf(ids: Seq[Long]): DataFrame =
    ids.map(i => (i, Timestamp.valueOf("2024-01-05 10:00:00"), 1L, "t", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("fda gender_clean: every branch of the reference CASE fires") {
    // gender_raw domain cycles on event_id % 9 (NULL on % 10): ids chosen to
    // hit F/FEMALE/female -> Female, M/MALE/Male -> Male, ''/' '/NULL ->
    // Not Reported, 'X' -> Other
    val out = RefMarts.fctFdaEventsByGender(eventsDf(1L to 200L))
      .select("gender").as[String].collect().toSet
    assert(out == Set("Female", "Male", "Not Reported", "Other"))
  }

  test("fda by_gender: only SUSPECT product roles are counted") {
    // role cycles on (id*3+1)%4 over SUSPECT/Suspect/suspect/CONCOMITANT —
    // 3 of 4 ids survive the upper() filter
    val total = RefMarts.fctFdaEventsByGender(eventsDf(1L to 200L))
      .agg(sum("event_count")).as[Long].head()
    assert(total == (1L to 200L).count(i => (i * 3 + 1) % 4 != 3))
  }

  test("recalls_by_state: lookup hit carries name+FIPS, planted XX misses") {
    val orders = Seq((53L * 56L, java.sql.Date.valueOf("2024-03-01")),
      (4L, java.sql.Date.valueOf("2024-03-02"))) // 4 % 56 = 4 -> 'CA'
      .toDF("o_orderkey", "o_orderdate")
    val rows = RefMarts.fctFdaRecallsByState(orders).collect()
      .map(r => r.getAs[String]("state_code") ->
        ((Option(r.getAs[String]("state_name")), Option(r.getAs[Any]("fips_code")))))
      .toMap
    assert(rows("CA") == ((Some("California"), Some(6L))))
    // 53*56 is divisible by 53 -> planted unknown code, LEFT-JOIN-NULL path
    assert(rows("XX") == ((None, None)))
  }

  test("recall topic battery: multi-topic reason explodes to its exact topics") {
    val recalls = Seq(
      (1L, "Class I", "CA", "Ongoing", "Firm 1",
        "Undeclared milk and eggs with potential salmonella risk",
        java.sql.Date.valueOf("2024-01-01")),
      (2L, "Class II", "NY", "Terminated", "Firm 2",
        "Quality defect reported by consumer",
        java.sql.Date.valueOf("2024-01-02")))
      .toDF("recall_number", "classification", "state_code", "status",
        "recalling_firm", "reason_for_recall", "recall_initiation_date")
    val t = RefMarts.intFdaRecallTopics(recalls).collect()
      .map(r => r.getAs[Long]("recall_number") ->
        ((r.getAs[Seq[String]]("topics"), r.getAs[Boolean]("has_pathogen"),
          r.getAs[Boolean]("has_allergen")))).toMap
    // battery order: Salmonella (pathogen block) before Milk/Dairy, Eggs
    assert(t(1L) == ((Seq("Salmonella", "Milk/Dairy", "Eggs"), true, true)))
    assert(t(2L) == ((Seq(), false, false))) // uncategorized -> empty, dropped by unnest
  }

  test("recalls_by_topic: rollup rows count distinct recalls, not topic rows") {
    // 24-phrase vocabulary over 1..240: every topic fires; the two
    // multi-topic phrases make Pathogen (Any) < sum of pathogen topics
    val orders = (1L to 240L)
      .map(k => (k, java.sql.Date.valueOf("2024-01-01")))
      .toDF("o_orderkey", "o_orderdate")
    val out = RefMarts.fctFdaRecallsByTopic(orders)
    val byTopic = out.collect().map(r =>
      r.getAs[String]("topic") -> r.getAs[Long]("recall_count")).toMap
    assert(byTopic.contains("Pathogen (Any)") && byTopic.contains("Allergen (Any)"))
    val pathogenTopics = Seq("Listeria", "Salmonella", "E. coli", "Other Pathogen")
    val summed = pathogenTopics.flatMap(byTopic.get).sum
    assert(byTopic("Pathogen (Any)") <= summed,
      "rollup must not double-count multi-pathogen recalls")
    assert(out.where(col("topic") === "Salmonella" &&
      col("topic_category") === "Pathogen").count() == 1)
  }

  test("keyword trends battery: java does not match javascript; c++ needs a word char after") {
    val docs = Seq((1L, "ignored")).toDF("doc_id", "text")
    def matches(title: String): Set[String] = {
      val kw = RefMarts.trendKeywords
      kw.filter { case (_, p) => java.util.regex.Pattern.compile(p)
        .matcher(title.toLowerCase).find() }.map(_._1).toSet
    }
    assert(matches("JavaScript fatigue") == Set("JavaScript"))
    assert(matches("java is fine") == Set("Java"))
    assert(!matches("c++ review").contains("C++")) // \b after '+' needs a word char
    assert(matches("c++17 review") == Set("C++"))
    assert(matches("go lang beats golang") == Set("Go"))
    assert(matches("ml in the cloud") == Set("Machine Learning", "Cloud"))
    assert(docs.count() == 1) // keep the fixture referenced
  }

  test("hn weekly stats: exact ratio means on a hand-checkable corpus") {
    val docs = (1L to 100L).map(i => (i, s"doc $i body")).toDF("doc_id", "text")
    val weekly = RefMarts.fctHnWeeklyStats(docs).collect()
    // planted NULL weeks (doc_id % 19 == 0) are filtered
    val counted = weekly.map(_.getAs[Long]("story_count")).sum
    assert(counted == (1L to 100L).count(_ % 19 != 0))
    weekly.foreach { r =>
      assert(r.getAs[Double]("avg_score") ==
        r.getAs[Long]("total_score").toDouble / r.getAs[Long]("story_count"))
    }
  }

  test("hn domain stats: NULL and '' domains drop, >=3 floor filters the tail") {
    val docs = (1L to 400L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = RefMarts.fctHnDomainStats(docs).collect()
    assert(out.nonEmpty)
    assert(out.forall(_.getAs[Long]("story_count") >= 3))
    assert(out.forall { r =>
      val d = r.getAs[String]("domain"); d != null && d.nonEmpty })
    // the 797-way tail means singleton (week, domain) cells exist and were
    // filtered: total surviving stories < total eligible stories
    val eligible = (1L to 400L).count(i => i % 19 != 0 && i % 17 != 0 && i % 13 != 0)
    assert(out.map(_.getAs[Long]("story_count")).sum < eligible)
  }

  test("by_product and by_topic stage their battery frame exactly once") {
    // fresh session: registration counts are order-independent there
    // (CacheScope registries are per-session; see PlanAuditSpec)
    import graft.operators.CacheScope
    val sess = spark.newSession()
    import sess.implicits._
    val ev = (1L to 50L)
      .map(i => (i, Timestamp.valueOf("2024-01-05 10:00:00"), 1L, "t", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val b0 = CacheScope.registeredKeys(sess).size
    RefMarts.fctFdaEventsByProduct(ev)
    assert(CacheScope.registeredKeys(sess).size - b0 == 1)
    val orders = (1L to 50L).map(k => (k, java.sql.Date.valueOf("2024-01-01")))
      .toDF("o_orderkey", "o_orderdate")
    val b1 = CacheScope.registeredKeys(sess).size
    RefMarts.fctFdaRecallsByTopic(orders)
    assert(CacheScope.registeredKeys(sess).size - b1 == 1)
  }
}
