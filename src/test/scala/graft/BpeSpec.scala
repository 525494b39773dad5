package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Bpe

/** Byte-level BPE with tiktoken-format vocabularies: format compat with a
  * real-world .tiktoken file (the reference repo's 5k-token test asset,
  * read-only), lossless round-trip, merge behavior, trainer determinism. */
class BpeSpec extends AnyFunSuite {
  private val refVocab = "/root/reference/tests/assets/tokens/tokens_5k.tiktoken"

  test("parses a real tiktoken vocab and round-trips text through it") {
    assume(new java.io.File(refVocab).exists())
    val ranks = Bpe.loadTiktoken(refVocab)
    assert(ranks.size == 5000)
    // all 256 single-byte tokens present ⇒ lossless round trip
    assert((0 until 256).forall(b =>
      ranks.contains(new String(Array(b.toByte), java.nio.charset.StandardCharsets.ISO_8859_1))))
    val inverse = ranks.map(_.swap)
    for (text <- Seq("hello world", "The quick brown fox!", "unicode: éß€", "  spaces  ")) {
      val ids = Bpe.encode(text, ranks)
      assert(ids.nonEmpty)
      assert(Bpe.decode(ids.toSeq, inverse) == text, s"roundtrip failed for '$text'")
    }
    // merges compress: a common English word should take < 1 token per byte
    val ids = Bpe.encode("the the the the", ranks)
    assert(ids.length < "the the the the".length)
  }

  test("trainer learns deterministic merges and saves loadable vocabs") {
    val corpus = Seq("aa bb aa bb cc", "aa bb aa", "aa cc aa")
    val r1 = Bpe.train(corpus, 8)
    val r2 = Bpe.train(corpus, 8)
    assert(r1 == r2, "training must be deterministic")
    assert(r1.size > 256, "merges were learned")
    val path = "/tmp/graft_bpe/spec_vocab.tiktoken"
    Bpe.saveTiktoken(r1, path)
    assert(Bpe.loadTiktoken(path) == r1)
    val inverse = r1.map(_.swap)
    val ids = Bpe.encode("aa bb aa zz", r1)
    assert(Bpe.decode(ids.toSeq, inverse) == "aa bb aa zz")
    // "aa" recurs: must encode to fewer tokens than bytes
    assert(Bpe.encode("aa aa aa aa", r1).length < 11)
  }
}
