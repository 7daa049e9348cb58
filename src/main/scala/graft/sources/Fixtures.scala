package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Session-scratch derived layouts of the read-only fixtures.
  *
  * The partitioned events copy backs `partitioned_scan_agg` (the
  * 100 TB directory layout in the graded path). It is keyed on the
  * SOURCE file's identity (path + mtime + size), so regenerating the
  * fixture at the same path invalidates the cache instead of silently
  * serving stale data; and it is built in a temp dir then atomically
  * renamed, so a concurrent reader never sees a half-written dataset. */
object Fixtures {

  /** Full md5 of a fixture-identity string, not String.hashCode: a
    * 32-bit collision between two sf dirs in one session would silently
    * serve a layout from the wrong scale factor (ADVICE r7). Every
    * persistent scratch key below goes through this. */
  private[graft] def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Idempotent; cheap when the layout already exists. Returns the
    * partitioned dataset path. Call from fixture-prep (e.g. Bench
    * warmup) so the one-off write never lands inside a timed body. */
  def ensurePartitionedEvents(spark: SparkSession, dir: String): String = synchronized {
    val src = Paths.get(dir, "events.parquet")
    val key = md5Hex(
      dir + "|" + Files.getLastModifiedTime(src).toMillis + "|" + Files.size(src))
    val path: Path = Paths.get(s"/dev/shm/graft-part/$key/events")
    if (!Files.exists(path)) {
      val tmp = Paths.get(path.toString + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
      Sinks.writePartitioned(
        graft.Tables(spark, dir).events, tmp.toString, Seq("event_type"))
      Files.createDirectories(path.getParent)
      try Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE)
      catch {
        // lost a race to a concurrent builder: its finished copy wins
        case _: java.nio.file.FileAlreadyExistsException
            | _: java.nio.file.AccessDeniedException =>
          delete(tmp)
      }
    }
    path.toString
  }

  /** Bucketed twin tables for the co-located join graded path: lineitem
    * and orders both bucketed (8) + sorted on the order key, registered
    * as EXTERNAL tables with /dev/shm data. Table names and data paths
    * are keyed on the source files' identity (the partitioned-events
    * cache discipline), so regenerated fixtures can't serve stale
    * buckets and concurrent sf dirs can't collide. Returns the
    * (lineitem, orders) table names. Rebuilds only when this session's
    * catalog has no entry — the bucketing METADATA lives in the session
    * catalog, so a fresh session re-registers (and rewrites) rather than
    * trusting bare parquet files whose bucket spec it can't see. */
  def ensureBucketedOrderTables(spark: SparkSession, dir: String): (String, String) = synchronized {
    val key = Seq("lineitem", "orders").map { t =>
      val p = Paths.get(dir, s"$t.parquet")
      Files.getLastModifiedTime(p).toMillis + "|" + Files.size(p)
    }.mkString(dir + "|", "|", "")
    val hex = md5Hex(key)
    val (liName, ordName) = (s"li_bkt_$hex", s"ord_bkt_$hex")
    val t = graft.Tables(spark, dir)
    // Gate on BOTH tables: a failure between the two saveAsTable calls
    // must trigger a rebuild of the pair, not a half-registered state.
    if (!(spark.catalog.tableExists(liName) && spark.catalog.tableExists(ordName))) {
      // Drop scratch from other fixture identities (regenerated or other
      // sf dirs) — mirrors the partitioned-events cache discipline.
      val root = Paths.get("/dev/shm/graft-bkt")
      if (Files.isDirectory(root)) {
        // snapshot the listing before deleting (mutating a directory
        // under an open Files.list stream is filesystem-dependent), and
        // close the stream — each leaked handle is a lost fd
        listChildren(root).foreach { p =>
          val h = p.getFileName.toString
          if (h != hex && !spark.catalog.tableExists(s"li_bkt_$h") &&
              !spark.catalog.tableExists(s"ord_bkt_$h")) delete(p)
        }
      }
      t.lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"/dev/shm/graft-bkt/$hex/lineitem")
        .saveAsTable(liName)
      t.orders.withColumnRenamed("o_orderkey", "l_orderkey")
        .write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"/dev/shm/graft-bkt/$hex/orders")
        .saveAsTable(ordName)
    }
    (liName, ordName)
  }

  /** Multi-file copy of the embeddings fixture for FileStreamSource
    * micro-batching: `n` range-partitioned parquet files (deterministic
    * vec_id ranges) so `maxFilesPerTrigger=1` yields n real incremental
    * batches from a single-file fixture. Same cache discipline as the
    * partitioned-events copy: keyed on the source file's identity,
    * built to a temp dir, atomically renamed. */
  def ensureEmbeddingStreamFiles(spark: SparkSession, dir: String,
                                 n: Int = 4): String = synchronized {
    val src = Paths.get(dir, "embeddings.parquet")
    val key = md5Hex(
      dir + "|emb|" + n + "|" + Files.getLastModifiedTime(src).toMillis +
        "|" + Files.size(src))
    val path: Path = Paths.get(s"/dev/shm/graft-embstream/$key")
    if (!Files.exists(path)) {
      val tmp = Paths.get(path.toString + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
      graft.Tables(spark, dir).embeddings
        .repartitionByRange(n, col("vec_id"))
        .write.mode("overwrite").parquet(tmp.toString)
      Files.createDirectories(path.getParent)
      try Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException
            | _: java.nio.file.AccessDeniedException =>
          delete(tmp)
      }
    }
    path.toString
  }

  /** Multi-file copy of `documents` (`n` range-partitioned parquet files
    * over doc_id) so `maxFilesPerTrigger=1` feeds the corpus to a
    * streaming query in n real micro-batches. Same identity-key +
    * atomic-rename discipline as the embedding stream copy. */
  def ensureDocStreamFiles(spark: SparkSession, dir: String,
                           n: Int = 3): String = synchronized {
    val src = Paths.get(dir, "documents.parquet")
    val key = md5Hex(
      dir + "|docs|" + n + "|" + Files.getLastModifiedTime(src).toMillis +
        "|" + Files.size(src))
    val path: Path = Paths.get(s"/dev/shm/graft-docstream/$key")
    if (!Files.exists(path)) {
      val tmp = Paths.get(path.toString + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
      graft.Tables(spark, dir).documents
        .repartitionByRange(n, col("doc_id"))
        .write.mode("overwrite").parquet(tmp.toString)
      Files.createDirectories(path.getParent)
      try Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException
            | _: java.nio.file.AccessDeniedException =>
          delete(tmp)
      }
    }
    path.toString
  }

  /** Multi-file copy of the distinct part-name token domain (tok, cnt)
    * for the streaming edit-distance twin: `n` range-partitioned parquet
    * files so `maxFilesPerTrigger=1` feeds the token universe in n real
    * increments. Each distinct token appears in EXACTLY one file with
    * its global count — the arrival-order contract the incremental
    * variant index relies on. Same identity-key + atomic-rename
    * discipline as the other stream copies. */
  def ensureTokenStreamFiles(spark: SparkSession, dir: String,
                             n: Int = 3): String = synchronized {
    val src = Paths.get(dir, "part.parquet")
    val key = md5Hex(
      dir + "|tok|" + n + "|" + Files.getLastModifiedTime(src).toMillis +
        "|" + Files.size(src))
    val path: Path = Paths.get(s"/dev/shm/graft-tokstream/$key")
    if (!Files.exists(path)) {
      val tmp = Paths.get(path.toString + ".tmp-" + java.util.UUID.randomUUID().toString.take(8))
      import org.apache.spark.sql.functions.{count, explode, lit, split}
      graft.Tables(spark, dir).part
        .select(explode(split(col("p_name"), " ")).as("tok"))
        .groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
        .repartitionByRange(n, col("tok"))
        .write.mode("overwrite").parquet(tmp.toString)
      Files.createDirectories(path.getParent)
      try Files.move(tmp, path, StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException
            | _: java.nio.file.AccessDeniedException =>
          delete(tmp)
      }
    }
    path.toString
  }

  /** Directory children as a materialized list, stream closed. */
  private def listChildren(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try {
      val it = s.iterator()
      val buf = Seq.newBuilder[Path]
      while (it.hasNext) buf += it.next()
      buf.result()
    } finally s.close()
  }

  private[graft] def delete(p: Path): Unit = {
    if (Files.isDirectory(p)) listChildren(p).foreach(delete)
    Files.deleteIfExists(p)
  }
}
