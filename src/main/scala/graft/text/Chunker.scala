package graft.text

import scala.collection.mutable.ArrayBuffer

/** Fixed-size overlapping text chunker, semantics-equivalent to the
  * reference's `chunk_text` (`/root/reference/repo_to_vector.py:256-306`).
  *
  * Rules (all must hold for behavioral parity — SURVEY.md §2.3, §2.9.3-4):
  *  - empty text → no chunks; text ≤ chunkSize → exactly one chunk (whole text);
  *  - tentative end = start + chunkSize; if that is not end-of-text, prefer
  *    breaking at the last '\n' in [start, end) when it lies strictly past
  *    start + chunkSize/2; otherwise at the last ' ' in
  *    [start + chunkSize/2, end); the break character is kept in the chunk
  *    (end = pos + 1);
  *  - the cursor advances to end - overlap only when that strictly advances
  *    past start, else to end (degenerate-overlap guard,
  *    repo_to_vector.py:298). Note this means a final chunk that is a pure
  *    suffix re-emission can occur (e.g. len=1500/size=1000/overlap=200
  *    yields [0,1000),[800,1500),[1300,1500)) — intentional parity quirk.
  */
object Chunker extends Serializable {

  val DefaultChunkSize = 1000
  val DefaultOverlap = 200

  def chunk(text: String,
            chunkSize: Int = DefaultChunkSize,
            overlap: Int = DefaultOverlap): Seq[String] =
    chunkSpans(text, chunkSize, overlap).map { case (s, e) => text.substring(s, e) }

  /** The [start, end) character spans of each chunk — the exact cursor
    * trace of the reference loop, exposed for span-level tests and
    * offset-preserving pipelines.
    */
  def chunkSpans(text: String,
                 chunkSize: Int = DefaultChunkSize,
                 overlap: Int = DefaultOverlap): Seq[(Int, Int)] = {
    // chunkSize = 0 would make `end = start` and the cursor never
    // advance — an infinite allocating loop, reachable from the SQL
    // surface via chunk_text(text, 0). Fail fast instead.
    require(chunkSize >= 1, s"chunkSize must be >= 1, got $chunkSize")
    require(overlap >= 0, s"overlap must be >= 0, got $overlap")
    if (text == null || text.isEmpty) return Seq.empty
    if (text.length <= chunkSize) return Seq((0, text.length))

    val out = ArrayBuffer.empty[(Int, Int)]
    val n = text.length
    var start = 0
    var break = false
    while (!break && start < n) {
      var end = math.min(start + chunkSize, n)
      if (end < n) {
        // last '\n' in [start, end), usable only strictly past the midpoint
        val nl = lastIndexIn(text, '\n', start, end)
        if (nl > start + chunkSize / 2) {
          end = nl + 1
        } else {
          // last ' ' in [start + chunkSize/2, end)
          val sp = lastIndexIn(text, ' ', start + chunkSize / 2, end)
          if (sp != -1) end = sp + 1
        }
      }
      out += ((start, end))
      start = if (end - overlap > start) end - overlap else end
      if (start >= n) break = true
    }
    out.toSeq
  }

  /** Python str.rfind(ch, from, until): highest index in [from, until) or -1. */
  private def lastIndexIn(s: String, ch: Char, from: Int, until: Int): Int = {
    val i = s.lastIndexOf(ch, until - 1)
    if (i >= from) i else -1
  }
}
