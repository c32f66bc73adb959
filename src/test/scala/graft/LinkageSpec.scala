package graft

import org.apache.spark.sql.functions._

import graft.queries.Linkage

/** Pins the record-linkage semantics the oracle can't isolate: full
  * recall on both planted edit classes, the single-pass recall failure
  * that motivates multi-pass blocking, and the distance threshold. */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    val left = Seq(
      (1L, "small copper ring"),
      (2L, "large brass gizmo"),
      (3L, "tiny steel bolt")).toDF("orig_id", "name")
    val right = Seq(
      (101L, "small copper rinq"), // tail substitution of 1 (dist 1)
      (102L, "lqrge brass gizmo"), // head substitution of 2 (dist 1)
      (103L, "tiny steel bolt on") // 3 chars appended to 3 (dist 3 — over threshold)
    ).toDF("typo_id", "name")
    (left, right)
  }

  test("fuzzyLink: links both edit classes, rejects past-threshold, exact distances") {
    val (left, right) = fixture
    val got = Linkage.fuzzyLink(left, right, maxDist = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === Set((1L, 101L, 1), (2L, 102L, 1)))
  }

  test("single-pass blocking misses the edit class inside its key region") {
    val (left, right) = fixture
    val prefixOnly = Linkage.blockedCandidates(left, right,
      Seq(c => substring(c, 1, 4)))
      .select("orig_id", "typo_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the head-substituted typo (102) shares no 4-char prefix with its origin
    assert(prefixOnly.contains((1L, 101L)))
    assert(!prefixOnly.contains((2L, 102L)))
    val suffixOnly = Linkage.blockedCandidates(left, right,
      Seq(c => c.substr(length(c) - lit(3), lit(4))))
      .select("orig_id", "typo_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // ...and the tail-substituted typo (101) shares no 4-char suffix
    assert(suffixOnly.contains((2L, 102L)))
    assert(!suffixOnly.contains((1L, 101L)))
  }

  test("entityResolution: transitive links fold to ONE golden record; singletons survive") {
    val left = Seq(
      (1L, "acme corp x"),
      (3L, "acme corp x"),   // same name as 1 — bridged via the shared typo
      (5L, "unrelated name")).toDF("orig_id", "name")
    val right = Seq((101L, "acme corp q")).toDF("typo_id", "name")
    val got = Linkage.entityResolution(left, right, maxDist = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // {1, 3, 101} resolve to master 1 (its name survives); 5 is a singleton entity
    assert(got === Set(
      (1L, 3L, "acme corp x"),
      (5L, 1L, "unrelated name")))
  }

  test("names shorter than the key width are excluded from blocking, not crashed on") {
    val left = Seq((1L, "abc"), (2L, "abcdefgh")).toDF("orig_id", "name")
    val right = Seq((101L, "abc"), (102L, "abcdefgq")).toDF("typo_id", "name")
    val got = Linkage.fuzzyLink(left, right, maxDist = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // the 3-char pair is identical but unblockable (sub-key-width);
    // the 8-char tail-substituted pair links normally
    assert(got === Set((2L, 102L)))
  }

  test("declared fixture: every planted typo links back to its origin") {
    val parts = Tables.part(spark, sf("sf0.001"))
    val q = SparkEntry.queries("link_fuzzy_parts")(spark, sf("sf0.001"))
    val links = q.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = parts.filter(col("p_partkey") % 20 === 0 || col("p_partkey") % 20 === 10)
      .select("p_partkey").collect().map(_.getLong(0))
    assert(planted.nonEmpty)
    planted.foreach { k =>
      assert(links.contains((k, k + 10000000L)), s"planted typo of part $k not linked")
    }
  }
}
