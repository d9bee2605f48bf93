package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-7 additions: hardening cases from the round-6 advice
  * (corrupted tar SIZE field) and specs for the operators added this
  * round. */
class Round7Spec extends AnyFunSuite {

  test("m_tar_index: a corrupted SIZE field stops the walk cleanly, never throws") {
    val tar = graft.multimodal.Multimodal.encodeTar(
      Seq(("a.txt", "hello".getBytes), ("b.txt", "world!".getBytes)))
    // blow up the first member's size field (bytes 124-135): a huge
    // octal value that exceeds the remaining archive length
    val bad = tar.clone()
    "77777777777".getBytes.zipWithIndex.foreach { case (b, i) => bad(124 + i) = b }
    val parsed = graft.multimodal.Multimodal.parseTar(bad)
    assert(parsed.nonEmpty, "the corrupted member itself must be reported")
    assert(!parsed.head._4, "checksum must catch the corrupted size")
    assert(parsed.head._3 == -1L, "impossible size is reported as -1")
    assert(parsed.length == 1, "the walk must stop — later offsets are garbage")
  }

  test("m_tar_index: a non-octal (unparseable) size field is handled the same way") {
    val tar = graft.multimodal.Multimodal.encodeTar(Seq(("a.txt", "hello".getBytes)))
    val bad = tar.clone()
    "zzzzzzzzzzz".getBytes.zipWithIndex.foreach { case (b, i) => bad(124 + i) = b }
    val parsed = graft.multimodal.Multimodal.parseTar(bad)
    assert(parsed.length == 1 && !parsed.head._4 && parsed.head._3 == -1L)
  }
}
