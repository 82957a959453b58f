package graft
/** Bench-shaped rerun: Bench warms every query against one SF dir and
  * times it against another IN THE SAME SESSION, and a catalog
  * instance (with its root) is cached per session by name — so the
  * catalog queries must drop-and-recreate their tables instead of
  * assuming a fresh root. This spec pins that contract (it caught the
  * original TableAlreadyExists failures in BENCH that Verify's
  * one-run-per-session shape could never see). */
class CatalogRerunSpec extends SparkTestBase {
  test("q6J and q6K survive same-session cross-sf reruns") {
    Seq("q6J_catalog_sql", "q6K_catalog_dml").foreach { q =>
      val fn = SparkEntry.queries(q)
      assert(fn(spark, "/root/testdata/sf0.001").count() > 0) // "warmup"
      assert(fn(spark, "/root/testdata/sf0.01").count() > 0)  // "timed"
      assert(fn(spark, "/root/testdata/sf0.01").count() > 0)  // repeat sample
    }
  }
}
