package graft

import org.apache.spark.sql.functions._

/** Diagnostic: cold-vs-warm cost of the bench's slowest per-row text ops.
  * Not a correctness gate — prints timings to stderr for plan iteration.
  */
class ProfileRepeatSpec extends SparkSpec {

  test("repeat timings: langid/repetition/minhash_pairs cold vs warm") {
    assume(sys.env.get("GRAFT_PROFILE").isDefined,
      "diagnostic only - set GRAFT_PROFILE=1 to run")
    val dir = sys.env.getOrElse("GRAFT_PROFILE_SF", "/root/testdata/sf0.1")
    val names = sys.env.get("GRAFT_PROFILE_QUERIES")
      .map(_.split(",").toSeq.filter(_.nonEmpty))
      .getOrElse(Seq("text_langid", "text_repetition", "dedup_minhash_pairs",
        "a5_count_check", "asof_join"))
    for (name <- names) {
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      System.err.println(f"[profile] $name%-24s " + times.map(t => f"$t%6.2f").mkString(" "))
    }
  }
}
