package graft.routing

/** Chunk-descriptor utilities — the reference's job-matrix sizing
  * (/root/reference/data/src/utils/utils.py:106-138,
  * data/src/split_chunks.py): split n work items into ≤ maxChunks
  * chunks of ≥ minSize, labeled with zero-padded `start-end` strings
  * (F4 — utils/utils.py:70-75) so labels sort lexicographically.
  */
object Chunks {

  /** chunk size honoring both caps (utils.py:115-126 logic). */
  def chunkSize(n: Long, minSize: Long, maxChunks: Int): Long = {
    val bySize = math.max(minSize, math.ceil(n.toDouble / maxChunks).toLong)
    math.min(math.max(bySize, 1L), math.max(n, 1L))
  }

  /** zero-padded half-open [start, end) labels covering 0 until n. */
  def labels(n: Long, size: Long): Seq[String] = {
    val width = math.max(n.toString.length, 1)
    (0L until n by size).map { s =>
      val e = math.min(s + size, n)
      s"%0${width}d-%0${width}d".format(s, e)
    }
  }
}
