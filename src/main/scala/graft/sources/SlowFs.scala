package graft.sources

import java.util.concurrent.atomic.AtomicLong

import org.apache.hadoop.fs.{FSDataInputStream, Path, PositionedReadable, Seekable}

/** PROBE-ONLY filesystem: the local FS with a configurable sleep on
  * every POSITIONED read, modeling the one property of object-store
  * I/O that page-cached local files cannot — per-request latency
  * (each ranged GET costs ~10–50 ms before the first byte arrives).
  *
  * `coalesceMembers` exists for exactly that regime
  * ([[WebArchive.sliceMembersRanged]]), but until round 16 the only
  * measurement was on local files, where the dial LOSES (syscalls are
  * free; the group path adds a shuffle + buffer cuts) — the winning
  * regime had never been demonstrated. `ScaleProbe archive-latency`
  * routes the q185 fetch path through this scheme and measures the
  * crossover; [[Round16Spec]] pins the request-count arithmetic
  * (the deterministic half of the claim) via [[SlowLocalFileSystem
  * .positionedReads]].
  *
  * Usage: set `fs.slowfile.impl = graft.sources.SlowLocalFileSystem`
  * and `fs.slowfile.delay.ms` in the session's Hadoop conf (the
  * `fs.*` prefix rides [[graft.functions.FileRangeCore.activeFsConf]]
  * to the expression), then address files as `slowfile:/abs/path`. */
class SlowLocalFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: java.net.URI = java.net.URI.create("slowfile:///")

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val delayMs = getConf.getLong("fs.slowfile.delay.ms", 20L)
    new FSDataInputStream(new SlowStream(super.open(f, bufferSize), delayMs))
  }
}

object SlowLocalFileSystem {
  /** Positioned reads issued through the scheme, process-wide — the
    * "how many GETs did this plan issue" counter the coalescing claim
    * is about. local-mode executors share the JVM, so a spec can
    * read it directly. */
  val positionedReads = new AtomicLong(0L)
}

private class SlowStream(in: FSDataInputStream, delayMs: Long)
    extends java.io.InputStream with Seekable with PositionedReadable {
  private def nap(): Unit = {
    SlowLocalFileSystem.positionedReads.incrementAndGet()
    if (delayMs > 0) Thread.sleep(delayMs)
  }
  override def read(): Int = in.read()
  override def read(b: Array[Byte], off: Int, len: Int): Int =
    in.read(b, off, len)
  override def read(position: Long, buffer: Array[Byte], offset: Int,
                    length: Int): Int = {
    nap(); in.read(position, buffer, offset, length)
  }
  override def readFully(position: Long, buffer: Array[Byte], offset: Int,
                         length: Int): Unit = {
    nap(); in.readFully(position, buffer, offset, length)
  }
  override def readFully(position: Long, buffer: Array[Byte]): Unit = {
    nap(); in.readFully(position, buffer)
  }
  override def seek(pos: Long): Unit = in.seek(pos)
  override def getPos: Long = in.getPos
  override def seekToNewSource(targetPos: Long): Boolean =
    in.seekToNewSource(targetPos)
  override def close(): Unit = in.close()
}
