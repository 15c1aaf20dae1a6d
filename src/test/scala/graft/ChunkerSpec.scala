package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.text.Chunker

/** Chunker parity spec — the break-preference and overlap-guard rules of
  * the reference (`/root/reference/repo_to_vector.py:256-306`, SURVEY.md
  * §2.3 / §2.9.3-4), plus structural invariants over seeded random text.
  */
class ChunkerSpec extends AnyFunSuite {

  test("empty and null text produce no chunks") {
    assert(Chunker.chunk("") == Seq.empty)
    assert(Chunker.chunk(null) == Seq.empty)
  }

  test("text shorter than chunkSize is a single whole chunk") {
    assert(Chunker.chunk("hello", 1000, 200) == Seq("hello"))
    val exact = "x" * 100
    assert(Chunker.chunk(exact, 100, 20) == Seq(exact))
  }

  test("newline break past midpoint is preferred, break char kept") {
    // size 10: window [0,10); '\n' at index 7 > midpoint 5 → chunk = [0,8)
    val t = "abcdefg\nhijklmnop"
    val got = Chunker.chunk(t, 10, 0)
    assert(got.head == "abcdefg\n")
  }

  test("newline at/before midpoint is ignored; falls back to space in back half") {
    // '\n' at 2 (<= mid 5) ignored; last ' ' in [5,10) at 7 → chunk = [0,8)
    val t = "ab\ncd f ghijklmno"
    val got = Chunker.chunk(t, 10, 0)
    assert(got.head == "ab\ncd f ")
  }

  test("no break char in back half → hard cut at chunkSize") {
    val t = "abcdefghijklmnopqrst"
    val got = Chunker.chunk(t, 10, 0)
    assert(got == Seq("abcdefghij", "klmnopqrst"))
  }

  test("overlap re-covers the tail of the previous chunk") {
    // len 1500, size 1000, overlap 200 → [0,1000),[800,1500),[1300,1500)
    // (the third chunk is the reference's suffix re-emission quirk)
    val t = ("a" * 999) + "b" * 501
    val got = Chunker.chunk(t, 1000, 200)
    assert(got.map(_.length) == Seq(1000, 700, 200))
    assert(got(0) == t.substring(0, 1000))
    assert(got(1) == t.substring(800, 1500))
    assert(got(2) == t.substring(1300, 1500))
  }

  test("overlap guard: terminates when overlap would not advance the cursor") {
    val t = ("x" * 6 + "\n") * 10
    val got = Chunker.chunk(t, 10, 9)
    assert(got.nonEmpty)
    assert(got.mkString.length >= t.length) // overlaps only add coverage
  }

  private def randomText(rnd: Random, len: Int): String = {
    val sb = new StringBuilder
    while (sb.length < len) {
      val r = rnd.nextInt(11)
      sb += (if (r < 8) ('a' + rnd.nextInt(26)).toChar
             else if (r < 10) ' ' else '\n')
    }
    sb.toString
  }

  test("property: every chunk is non-empty and at most chunkSize chars") {
    val rnd = new Random(42)
    for (_ <- 1 to 200) {
      val t = randomText(rnd, rnd.nextInt(400))
      val size = 4 + rnd.nextInt(61)
      val ov = rnd.nextInt(size)
      val chunks = Chunker.chunk(t, size, ov)
      assert(chunks.forall(c => c.nonEmpty && c.length <= size),
        s"size=$size ov=$ov text='${t.take(80)}'")
    }
  }

  test("property: spans cover the text with no gaps; chunk == substring(span)") {
    val rnd = new Random(7)
    for (_ <- 1 to 300) {
      val t = randomText(rnd, 1 + rnd.nextInt(500))
      val size = 4 + rnd.nextInt(61)
      val spans = Chunker.chunkSpans(t, size, size / 5)
      val chunks = Chunker.chunk(t, size, size / 5)
      assert(spans.map { case (s, e) => t.substring(s, e) } == chunks)
      assert(spans.head._1 == 0)
      assert(spans.last._2 == t.length)
      spans.sliding(2).foreach {
        case Seq((_, e1), (s2, _)) =>
          assert(s2 <= e1, s"gap between spans: end=$e1 next_start=$s2")
          assert(s2 > 0, "cursor must advance")
        case _ =>
      }
      // spans advance monotonically (ends may repeat at text end — the
      // suffix re-emission quirk)
      assert(spans.map(_._1) == spans.map(_._1).sorted)
      assert(spans.map(_._2) == spans.map(_._2).sorted)
    }
  }

  test("property: zero overlap with no break chars → exact tiling") {
    for (len <- Seq(1, 5, 49, 50, 51, 100, 299); size <- Seq(4, 10, 50)) {
      val t = "q" * len
      assert(Chunker.chunk(t, size, 0).mkString == t, s"len=$len size=$size")
    }
  }

  test("boundary classification: the kept break char fully encodes the decision") {
    // the q152 contract: for every NON-final span, charAt(e-1) is '\n'
    // iff the newline rule fired, ' ' iff the space rule fired, and a
    // hard cut can never end in either (those positions would have been
    // chosen by the break rules). Fuzz over break-char-rich text.
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 50) {
      val t = (0 until 500).map { _ =>
        rnd.nextInt(10) match {
          case 0 => '\n'
          case 1 | 2 => ' '
          case _ => ('a' + rnd.nextInt(26)).toChar
        }
      }.mkString
      val size = 40 + rnd.nextInt(60)
      for ((s, e) <- Chunker.chunkSpans(t, size, size / 4) if e < t.length) {
        val last = t.charAt(e - 1)
        if (last != '\n' && last != ' ') {
          // hard cut: the window must contain NO usable newline and no
          // back-half space — i.e. e is exactly the tentative cut
          assert(e == s + size, s"trial $trial: hard cut not at s+size: ($s,$e)")
        }
      }
    }
  }
}
