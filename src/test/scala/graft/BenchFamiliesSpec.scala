package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the `-families` bench partition against the headline registry:
  * every listed gate must exist and be headline (a rename must fail here,
  * not silently bench nothing), no gate may appear in two families (it
  * would be double-counted in the total), and the runFamilies catch-all
  * covers anything unlisted — asserted by construction here so the
  * invariant survives new headline gates.
  */
class BenchFamiliesSpec extends AnyFunSuite {
  private val headline = Registry.all.filter(_.headline).map(_.name).toSet
  private val listed = Bench.families.flatMap(_._2)

  test("every family member is a live headline gate") {
    val stale = listed.filterNot(headline)
    assert(stale.isEmpty, s"stale/non-headline gates in Bench.families: $stale")
  }

  test("no gate is double-counted across families") {
    val dups = listed.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicated in Bench.families: $dups")
  }

  test("the PRODUCTION family plan covers the headline set exactly, no dups") {
    // familyPlan is the plan runFamilies executes (not re-derived here):
    // its flattened gate list must be a permutation of the headline set
    val planned = Bench.familyPlan(headline.toSeq.sorted).flatMap(_._2)
    assert(planned.sorted == headline.toSeq.sorted)
    assert(planned.distinct.size == planned.size)
  }

  test("emitContract prints the JSON line AND mirrors it verbatim to the out file") {
    // r17 verdict #2: the driver's extractor lost the stdout line to sbt's
    // `[info] ` framing two rounds running — the contract line must also
    // land byte-identically in a file no log framing can touch, and the
    // stdout print must remain (the primary contract)
    val tmp = java.nio.file.Files.createTempFile("bench_out", ".json")
    val line = """{"metric":"total","value":1.234,"unit":"sec","queries":{}}"""
    val buf = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
      Bench.emitContract(line, tmp.toString)
    }
    assert(buf.toString("UTF-8").contains(line), "stdout line lost")
    val read = new String(java.nio.file.Files.readAllBytes(tmp), "UTF-8")
    assert(read == line + "\n", "file copy must be the verbatim line")
    // an unwritable path must not kill the bench (stdout still carries it)
    Console.withOut(new java.io.PrintStream(buf, true, "UTF-8")) {
      Bench.emitContract(line, "/nonexistent-dir-xyz/bench_out.json")
    }
    java.nio.file.Files.deleteIfExists(tmp)
    ()
  }
}
