package graft.functions

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Byte-range reads against files — the primitive that turns a
  * persisted archive member index (`(path, offset, clen)` rows, the
  * cluster.idx shape Common Crawl ships) into a FAN-OUT ingest where
  * the unit of I/O is the member, never the file: each task seeks and
  * reads only its members' byte ranges, so a multi-GB compressed crawl
  * file is ingested without any task ever materializing it whole (the
  * `binaryFile` route holds the entire payload in one row and is
  * int-indexed, 2 GiB-bound; this path's per-slice bound is one
  * member).
  *
  * I/O goes through the Hadoop `FileSystem` API, so paths are
  * scheme-transparent (`file://`, `hdfs://`, `s3a://`, `gs://` — the
  * S12 stance): the positioned `readFully(offset, buf)` becomes an
  * HTTP ranged GET on object stores, which is exactly how production
  * crawl readers consume cluster.idx. `fs.*` Hadoop settings of the
  * ACTIVE session (endpoints, credential providers) are captured on
  * the driver at expression build and re-applied executor-side, so
  * `spark.hadoop.fs.s3a.*` session config reaches the read without
  * shipping a whole `Configuration`.
  *
  * Failure is DATA, not an error (the quarantine convention): a
  * missing file, short read, permission failure, or a range past the
  * cap yields `(slice = null, err = reason)` — one bad index row must
  * not kill a 100 TB ingest. The expression assumes crawl archives
  * are immutable artifacts (they are, by convention: a crawl file is
  * write-once), which is what makes it safe to treat as deterministic
  * and leave inside codegen spans.
  */
object FileRangeCore {

  /** Per-range byte cap: one range is one COMPRESSED member, and the
    * member-payload bomb budget is [[GzipArchiveCore.MaxMemberBytes]]
    * decompressed — a compressed member claiming more than that is a
    * corrupt or hostile index row, not a document. Also bounds one
    * task's single allocation. */
  val MaxRangeBytes: Long = GzipArchiveCore.MaxMemberBytes

  val rangeSchema: StructType = StructType(Seq(
    StructField("slice", BinaryType, nullable = true),
    StructField("err", StringType, nullable = true)))

  /** `fs.*`-prefixed Hadoop entries of the active session, captured
    * driver-side at expression construction (empty when no session is
    * active, e.g. executor-side re-instantiation — the executor then
    * falls back to its classpath core-site, which in a real cluster
    * carries the same settings). Sorted for stable plan equality. */
  def activeFsConf(): Seq[(String, String)] =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration.iterator().asScala
        .map(e => e.getKey -> e.getValue)
        .filter(_._1.startsWith("fs."))
        .toSeq.sortBy(_._1))
      .getOrElse(Seq.empty)

  // one Configuration per distinct override set per JVM: Configuration
  // construction parses XML resources — far too slow per row
  private val confCache =
    new java.util.concurrent.ConcurrentHashMap[Seq[(String, String)], Configuration]()

  private[functions] def hadoopConf(fsConf: Seq[(String, String)]): Configuration =
    confCache.computeIfAbsent(fsConf, k => {
      val c = new Configuration()
      k.foreach { case (key, value) => c.set(key, value) }
      c
    })

  private def err(msg: String): GenericInternalRow =
    new GenericInternalRow(Array[Any](null, UTF8String.fromString(msg)))

  /** Per-THREAD open-stream cache: an index sorted by (path, offset)
    * gives each task long runs of members from the same file, and
    * re-opening per member costs a syscall locally and a HEAD request
    * on object stores. Positioned reads (`PositionedReadable`) are
    * thread-safe by Hadoop contract, but EVICTION is not — a shared
    * cache closing a stream another thread is mid-read on would
    * quarantine a healthy member — so the cache is thread-local
    * (task threads are long-lived): ≤ [[StreamCacheSize]] streams per
    * thread, LRU-closed on eviction, reclaimed with the executor. */
  private val StreamCacheSize = 4

  private val streamCache =
    new ThreadLocal[java.util.LinkedHashMap[String, org.apache.hadoop.fs.FSDataInputStream]] {
      override def initialValue() =
        new java.util.LinkedHashMap[String, org.apache.hadoop.fs.FSDataInputStream](
          8, 0.75f, true) {
          override def removeEldestEntry(
              e: java.util.Map.Entry[String, org.apache.hadoop.fs.FSDataInputStream]): Boolean =
            if (size() > StreamCacheSize) {
              try e.getValue.close() catch { case _: Exception => }
              true
            } else false
        }
    }

  // cache key carries the override set, not just the path: two
  // expressions with different fs.* overrides reading the SAME path
  // must not reuse a stream opened under the other configuration.
  // The key embeds the conf CONTENTS (sorted, NUL-separated — conf
  // keys/values are printable), not Seq.hashCode: a 32-bit hash made
  // cross-configuration reuse improbable instead of impossible
  // (ADVICE r16 low — two override sets colliding in hashCode would
  // share one stream on the same path).
  private def cacheKey(path: String, fsConf: Seq[(String, String)]): String =
    fsConf.map { case (k, v) => k + "\u0000" + v }.sorted
      .mkString("\u0000") + "|" + path

  private def openCached(path: String,
                         fsConf: Seq[(String, String)]): org.apache.hadoop.fs.FSDataInputStream = {
    val cache = streamCache.get()
    val key = cacheKey(path, fsConf)
    val hit = cache.get(key)
    if (hit != null) hit
    else {
      val p = new org.apache.hadoop.fs.Path(path)
      val in = p.getFileSystem(hadoopConf(fsConf)).open(p)
      cache.put(key, in)
      in
    }
  }

  private def evict(path: String, fsConf: Seq[(String, String)]): Unit = {
    val in = streamCache.get().remove(cacheKey(path, fsConf))
    if (in != null) try in.close() catch { case _: Exception => }
  }

  /** Positioned read of `[offset, offset+len)` from `path`. Hadoop
    * caches `FileSystem` instances per (scheme, authority) and the
    * per-thread cache above holds the stream open across a task's run
    * of same-file members, so the steady-state per-row cost is ONE
    * positioned read — on object storage, one ranged GET per member,
    * the production access pattern a crawl index exists to enable. A
    * failed read retries once on a FRESH stream (a cached handle can
    * go stale if the file was replaced — crawl archives are immutable
    * by convention, but the retry makes the cache invisible either
    * way) before quarantining. */
  def read(path: UTF8String, offset: Long, len: Long, maxBytes: Long,
           fsConf: Seq[(String, String)]): GenericInternalRow = {
    if (offset < 0 || len < 0)
      return err(s"negative range (offset=$offset, len=$len)")
    if (len > maxBytes)
      return err(s"range length $len exceeds $maxBytes byte cap")
    if (len > Int.MaxValue - 16)
      return err(s"range length $len exceeds JVM array bound")
    val pathStr = path.toString
    def attempt(): GenericInternalRow = {
      val in = openCached(pathStr, fsConf)
      val buf = new Array[Byte](len.toInt)
      in.readFully(offset, buf)
      new GenericInternalRow(Array[Any](buf, null))
    }
    try attempt()
    catch {
      case scala.util.control.NonFatal(_) =>
        evict(pathStr, fsConf)
        try attempt()
        catch {
          case scala.util.control.NonFatal(e) =>
            evict(pathStr, fsConf)
            err(s"range read failed: ${e.getClass.getSimpleName}: ${e.getMessage}")
        }
    }
  }
}

/** `file_range_read(path STRING, offset BIGINT, len BIGINT[,
  * max_bytes BIGINT]) -> struct<slice binary, err string>` — see
  * [[FileRangeCore]]. `max_bytes` defaults to
  * [[FileRangeCore.MaxRangeBytes]]; failures come back as `err`, not
  * exceptions. */
case class FileRangeRead(first: Expression, second: Expression,
                         third: Expression,
                         maxBytes: Long = FileRangeCore.MaxRangeBytes,
                         fsConf: Seq[(String, String)] =
                           FileRangeCore.activeFsConf())
  extends TernaryExpression {

  /** DECLARED non-deterministic — not because the result varies (an
    * immutable archive always returns the same bytes) but to pin the
    * I/O to where the plan put it. Deterministic status licenses two
    * optimizer moves that are each catastrophic for a ranged-GET
    * expression (both observed, r16 `ScaleProbe archive-latency`):
    * CollapseProject re-evaluates the read once per extracted struct
    * field, and PushDownPredicate rewrites a caller's
    * `slice_err IS NULL` filter through the projection and BELOW the
    * `fanoutPartitions` exchange — every member then fetches inside
    * the index SCAN stage (one task per index file: the 10k-member
    * latency probe ran its reads SERIALLY, 204 s at 20 ms/GET) and
    * AGAIN post-shuffle, doubling GET count. Non-determinism forbids
    * both rewrites: one read per row, executed in the stage the
    * dataflow placed it. */
  override lazy val deterministic: Boolean = false

  override def dataType: DataType = FileRangeCore.rangeSchema
  override def nullable: Boolean =
    first.nullable || second.nullable || third.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType | LongType, IntegerType | LongType)
        if maxBytes > 0 => TypeCheckResult.TypeCheckSuccess
      case (StringType, IntegerType | LongType, IntegerType | LongType) =>
        TypeCheckResult.TypeCheckFailure(
          s"file_range_read max_bytes must be positive, got $maxBytes")
      case other => TypeCheckResult.TypeCheckFailure(
        s"file_range_read requires (string, bigint, bigint), got $other")
    }

  override def nullSafeEval(path: Any, offset: Any, len: Any): Any =
    FileRangeCore.read(path.asInstanceOf[UTF8String],
      offset.asInstanceOf[Number].longValue(),
      len.asInstanceOf[Number].longValue(), maxBytes, fsConf)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val conf = ctx.addReferenceObj("fsConf", fsConf,
      "scala.collection.immutable.Seq")
    nullSafeCodeGen(ctx, ev, (p, o, l) =>
      s"${ev.value} = graft.functions.FileRangeCore.read($p, (long)($o), " +
        s"(long)($l), ${maxBytes}L, $conf);")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): FileRangeRead =
    copy(first = newFirst, second = newSecond, third = newThird)
  override def prettyName: String = "file_range_read"
}

object FileRangeRead {
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    FunctionCatalog.register(spark, "file_range_read", classOf[FileRangeRead])
}
