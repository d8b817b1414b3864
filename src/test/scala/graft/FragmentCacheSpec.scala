package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.ops.FragmentCache

/** I25 FragmentCache hardening contract (VERDICT r5 #4 + ADVICE):
  * per-session UUID keys (two live sessions can never share a
  * fragment), single materialization per key, explicit session
  * eviction with immediate unpersist, and the bounded-size insert
  * check that turns the "only small frames" comment into a hard
  * failure.
  */
class FragmentCacheSpec extends SparkSpec {

  private def tinyInput = {
    import spark.implicits._
    (1 to 10).map(i => (i.toLong, s"t$i")).toDF("id", "t")
  }

  test("fragment builds once per session and twice across two sessions") {
    FragmentCache.clear()
    val builds = new AtomicInteger(0)
    val in = tinyInput
    def serve(s: org.apache.spark.sql.SparkSession) =
      FragmentCache.materialize(s, in, "spec:iso") {
        builds.incrementAndGet()
        in.withColumn("v", col("id") * 2)
      }
    val a1 = serve(spark).count()
    val a2 = serve(spark).count()
    assert(a1 == 10 && a2 == 10 && builds.get() == 1,
      "same session must reuse the materialized fragment")
    val s2 = spark.newSession()
    assert(serve(s2).count() == 10 && builds.get() == 2,
      "a second session must get its own fragment, not the first's")
    // evicting s2 must not disturb the first session's entry
    FragmentCache.evictSession(s2)
    assert(serve(spark).count() == 10 && builds.get() == 2,
      "evicting one session must leave the other session's entry cached")
    assert(serve(s2).count() == 10 && builds.get() == 3,
      "after eviction the evicted session rebuilds")
    FragmentCache.clear()
  }

  test("insert rejects a fragment over the row bound and unpersists it") {
    FragmentCache.clear()
    val in = tinyInput
    val ex = intercept[IllegalStateException] {
      FragmentCache.materialize(spark, in, "spec:toobig", maxRows = 5L) {
        in
      }
    }
    assert(ex.getMessage.contains("10 rows") &&
      ex.getMessage.contains("max 5"),
      s"bound violation must name actual and max rows: ${ex.getMessage}")
    // the failed slot must not serve a cached frame afterwards either
    val ok = FragmentCache.materialize(spark, in, "spec:toobig") { in }
    assert(ok.count() == 10)
    FragmentCache.clear()
  }
}
