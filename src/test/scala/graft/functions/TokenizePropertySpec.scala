package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property pin for the byte-scan tokenizer against the regex formulation
  * it replaced: `UTF8String.split("[^a-z0-9']+", -1)` + drop-empties. The
  * scan underpins every text expression (tokens, shingles, minhash,
  * simhash, contamination, repetition), so its equivalence claim — byte
  * runs over the ASCII token class coincide with UTF8_BINARY regex runs
  * because UTF-8 lead/continuation bytes are never token bytes — gets an
  * adversarial generator here, not just the fixed spec corpus: random
  * mixes of token chars, ASCII separators, uppercase (a separator for
  * BOTH sides — the contract presumes a `Lower` child but must agree on
  * un-lowercased input too), multi-byte unicode incl. astral planes,
  * isolated quote runs, and control bytes.
  */
class TokenizePropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(7L + i)))

  private val piece: Gen[String] = Gen.oneOf(
    Gen.stringOf(Gen.oneOf(Gen.alphaLowerChar, Gen.numChar, Gen.const('\''))),
    Gen.stringOf(Gen.oneOf(' ', '\t', '\n', ',', '.', '!', '-', '_', '"')),
    Gen.listOf(Gen.oneOf("A", "Z", "\u00c9", "\u00df", "\u00f1", "\u0648", "\u4e2d", "\ud83c\udf89", " ", "\u00ad")).map(_.mkString),
    Gen.const("''"), Gen.const("'"), Gen.const(""))

  private val text: Gen[String] =
    Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, piece).map(_.mkString))

  private def reference(s: UTF8String): Seq[String] =
    s.split(UTF8String.fromString(TextExprs.TokenSep), -1)
      .filter(_.numBytes() > 0).map(_.toString).toSeq

  test("byte-scan tokenize == regex split + drop-empties on adversarial strings") {
    val corpus = samples(text, 2000)
    assert(corpus.exists(_.exists(_ > 'z')), "generator lost its unicode arm")
    corpus.foreach { raw =>
      val u = UTF8String.fromString(raw)
      val got = TextExprs.tokenize(u).map(_.toString).toSeq
      val want = reference(u)
      assert(got == want,
        s"tokenize mismatch on ${raw.getBytes("UTF-8").map("%02x".format(_)).mkString(" ")}: got $got want $want")
    }
  }
}
