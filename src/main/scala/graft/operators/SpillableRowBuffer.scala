package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.Row

/** Disk-spilling indexed row buffer — [[MatchRecognize]]'s per-key
  * working set, with the same spill-beyond-memory posture as the
  * reference's per-partition row index (its window/pattern operators
  * buffer a partition in a PagesIndex and revocable memory lets the
  * engine spill it instead of failing; we reproduce the contract, not
  * the mechanism): the first `memCap` rows stay on-heap; past that,
  * rows accumulate into fixed-size pages that are serialized to a
  * task-local temp file and re-read on demand through a two-page
  * cache. The NFA's access pattern is a forward scan with bounded
  * local backtracking plus per-match measure passes, so consecutive
  * accesses overwhelmingly hit the cached pages and the spilled path
  * stays near-sequential I/O.
  *
  * Single-threaded by contract (one task drives one buffer). Call
  * [[dispose]] after the key group is processed — the temp file is
  * deleted eagerly, not left for JVM exit.
  */
private[graft] final class SpillableRowBuffer(
    memCap: Int, pageSize: Int = 1 << 14) extends scala.collection.IndexedSeq[Row] {

  private val mem = new mutable.ArrayBuffer[Row]()
  private var pageBuf = new mutable.ArrayBuffer[Row]()
  private var flushedPages = 0
  private var file: java.io.RandomAccessFile = _
  private var path: java.io.File = _
  private val pageOffsets = new mutable.ArrayBuffer[Long]()
  // two-page LRU: A = most recent, B = previous
  private var cIdxA = -1
  private var cPageA: Array[Row] = _
  private var cIdxB = -1
  private var cPageB: Array[Row] = _

  /** True once any row went to the disk path (observable for tests). */
  def spilled: Boolean = flushedPages > 0 || pageBuf.nonEmpty

  def append(r: Row): Unit =
    if (!spilled && mem.length < memCap) mem += r
    else {
      if (!spilled) MatchRecognize.SpillCount.incrementAndGet()
      pageBuf += r
      if (pageBuf.length == pageSize) flushPage()
    }

  private def flushPage(): Unit = {
    if (file == null) {
      // Spill under Spark's configured local dirs (spark.local.dir /
      // SPARK_LOCAL_DIRS), not java.io.tmpdir: /tmp is commonly tmpfs
      // (RAM-backed), which would defeat the spill-to-disk contract,
      // and Spark's dirs are sized and cleaned up by the cluster
      // manager. The crash backstop is a task-completion listener
      // (bounded lifetime), not deleteOnExit (leaks a registry entry
      // per spill for the life of the executor JVM).
      val dirs = Option(org.apache.spark.SparkEnv.get)
        .map(e => e.conf.get("spark.local.dir",
          System.getProperty("java.io.tmpdir")))
        .getOrElse(System.getProperty("java.io.tmpdir"))
        .split(",").map(_.trim).filter(_.nonEmpty)
      val dir = new java.io.File(
        dirs(scala.util.Random.nextInt(dirs.length)))
      path = java.io.File.createTempFile("graft_mr_spill_", ".bin", dir)
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit] { _ => dispose() })
      file = new java.io.RandomAccessFile(path, "rw")
    }
    val bos = new java.io.ByteArrayOutputStream(1 << 16)
    val oos = new java.io.ObjectOutputStream(bos)
    // one object per page: Java serialization shares the (identical)
    // schema reference across the page's rows, so it is written once
    oos.writeObject(pageBuf.toArray)
    oos.close()
    val bytes = bos.toByteArray
    val off = file.length()
    file.seek(off)
    file.writeInt(bytes.length)
    file.write(bytes)
    pageOffsets += off
    flushedPages += 1
    pageBuf = new mutable.ArrayBuffer[Row]()
  }

  private def loadPage(p: Int): Array[Row] = {
    if (p == cIdxA) return cPageA
    if (p == cIdxB) { // swap B up to A
      val tp = cPageA; val ti = cIdxA
      cPageA = cPageB; cIdxA = cIdxB
      cPageB = tp; cIdxB = ti
      return cPageA
    }
    file.seek(pageOffsets(p))
    val len = file.readInt()
    val bytes = new Array[Byte](len)
    file.readFully(bytes)
    val arr = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes)).readObject().asInstanceOf[Array[Row]]
    cIdxB = cIdxA; cPageB = cPageA
    cIdxA = p; cPageA = arr
    arr
  }

  override def length: Int = mem.length + flushedPages * pageSize + pageBuf.length

  override def apply(i: Int): Row =
    if (i < mem.length) mem(i)
    else {
      val j = i - mem.length
      val p = j / pageSize
      if (p < flushedPages) loadPage(p)(j % pageSize)
      else pageBuf(j - flushedPages * pageSize)
    }

  def dispose(): Unit = {
    if (file != null) {
      file.close()
      path.delete()
      file = null
    }
    mem.clear()
    pageBuf.clear()
    cPageA = null; cPageB = null; cIdxA = -1; cIdxB = -1
  }
}
