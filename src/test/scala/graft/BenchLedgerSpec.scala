package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the regression-ledger loader: sf gating by BASENAME (the ledger's
  * path prefix is machine-specific), per-gate extraction, and the silent
  * empty fallbacks (no ledger → no vs_best fields, never a crash).
  */
class BenchLedgerSpec extends AnyFunSuite {

  private def withLedger[A](body: String)(f: => A): A = {
    val file = java.nio.file.Files.createTempDirectory("ledger")
      .resolve("BENCH_BEST.json")
    java.nio.file.Files.write(file, body.getBytes("UTF-8"))
    BenchLedgerSpec.withEnv("GRAFT_BENCH_BEST", file.toString)(f)
  }

  test("basename sf matching + per-gate extraction") {
    val body =
      """{"protocol":"families","sf":"/some/other/prefix/sf0.1",
        |"best":{"q_agg":0.197,"q_scan_filter":0.114}}""".stripMargin
    withLedger(body) {
      val m = Bench.loadBest("/root/testdata/sf0.1")
      assert(m == Map("q_agg" -> 0.197, "q_scan_filter" -> 0.114))
      assert(Bench.loadBest("/root/testdata/sf0.01").isEmpty, "sf mismatch must gate")
    }
  }

  test("missing or malformed ledger degrades to empty, never throws") {
    graft.BenchLedgerSpec.withEnv("GRAFT_BENCH_BEST", "/nonexistent/ledger.json") {
      assert(Bench.loadBest("/root/testdata/sf0.1").isEmpty)
    }
    withLedger("{not json at all") {
      assert(Bench.loadBest("/root/testdata/sf0.1").isEmpty)
    }
  }
}

object BenchLedgerSpec {
  /** Reflectively override an env var for the block (test-only shim —
    * the JVM offers no supported setenv; this mutates the cached map the
    * same way scalatest env-stubbing libraries do). PROCESS-GLOBAL: safe
    * here because forked suites run sequentially (Test/fork := true with
    * sbt's default testForkedParallel = false); revisit if parallel
    * forked execution is ever enabled.
    */
  def withEnv[A](k: String, v: String)(f: => A): A = {
    val envField = Class.forName("java.lang.ProcessEnvironment")
      .getDeclaredField("theUnmodifiableEnvironment")
    envField.setAccessible(true)
    val unmod = envField.get(null).asInstanceOf[java.util.Map[String, String]]
    val innerField = Class.forName("java.util.Collections$UnmodifiableMap")
      .getDeclaredField("m")
    innerField.setAccessible(true)
    val inner = innerField.get(unmod).asInstanceOf[java.util.Map[String, String]]
    val old = Option(inner.get(k))
    inner.put(k, v)
    try f finally old match {
      case Some(o) => inner.put(k, o)
      case None => inner.remove(k); ()
    }
  }
}
