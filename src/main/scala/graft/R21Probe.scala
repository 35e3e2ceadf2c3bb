package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Dev probe for the r21 optimization round: A/B candidate plan shapes
  * for the graph trio (q198/q201/q202) on the REAL memoized
  * co-engagement frame, with result-equality checks against the
  * current forms (count + symmetric except) before anything ships.
  *
  * Variants under test (guide §2.4 "remove shuffles outright"):
  *  - edge frame persisted AS-IS (current memo shape) vs
  *    repartition(P, src) + sortWithinPartitions(src, dst) at
  *    materialization — cached output partitioning/ordering then
  *    satisfies every round's join requirement on the edge side.
  *  - join orientation FLIPPED to src (edges are directed-symmetric,
  *    so attaching the survivor test / neighbor value on src and
  *    aggregating on dst computes the identical multiset) — the
  *    per-round aggregation then shrinks map-side before its
  *    exchange instead of re-shuffling edge volume.
  *  - coreness h-index from grouped (node, value, count) rows
  *    instead of a row_number window over raw edge volume:
  *    h = max over distinct values v of least(cum_count(v), v).
  */
object R21Probe {

  private def timeIt[T](f: => T): (T, Double) = {
    val t0 = System.nanoTime()
    val r = f
    (r, (System.nanoTime() - t0) / 1e9)
  }

  // ---- current forms (copies of TextQueries.kCore / coreness) ----

  private def kCoreCur(edges: DataFrame, k: Int, iters: Int): DataFrame = {
    var surv = edges.select(col("src").as("v")).distinct()
      .withColumn("deg", lit(0L))
    for (_ <- 1 to iters) {
      surv = edges
        .join(surv.select(col("v").as("dst")), Seq("dst"), "left_semi")
        .groupBy(col("src").as("v"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
    }
    surv
  }

  private def corenessCur(edges: DataFrame, iters: Int): DataFrame = {
    val w = Window.partitionBy("src").orderBy(col("cv").desc)
    var c = edges.groupBy(col("src").as("v")).agg(count(lit(1)).as("c"))
    for (_ <- 1 to iters) {
      c = edges
        .join(c.select(col("v").as("dst"), col("c").as("cv")), "dst")
        .withColumn("rn", row_number().over(w).cast("long"))
        .groupBy(col("src").as("v"))
        .agg(max(least(col("rn"), col("cv"))).as("c"))
    }
    c
  }

  // ---- candidate forms ----

  /** Flipped orientation: semi-join the SURVIVOR test onto src (the
    * cached frame's partition key), count on dst. Identical output by
    * edge symmetry. */
  private def kCoreFlip(edges: DataFrame, k: Int, iters: Int): DataFrame = {
    var surv = edges.select(col("src").as("v")).distinct()
      .withColumn("deg", lit(0L))
    for (_ <- 1 to iters) {
      surv = edges
        .join(surv.select(col("v").as("src")), Seq("src"), "left_semi")
        .groupBy(col("dst").as("v"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
    }
    surv
  }

  /** Flipped + grouped h-index: join neighbor values on src, group to
    * (dst, cv, cnt), running count over cv desc, h = max(least(cum,
    * cv)). Grouped cv rows are distinct per dst so the default RANGE
    * frame equals ROWS; h equals the row_number form exactly. */
  private def corenessFlip(edges: DataFrame, iters: Int): DataFrame = {
    val w = Window.partitionBy("dst").orderBy(col("cv").desc)
    var c = edges.groupBy(col("src").as("v")).agg(count(lit(1)).as("c"))
    for (_ <- 1 to iters) {
      c = edges
        .join(c.select(col("v").as("src"), col("c").as("cv")), "src")
        .groupBy(col("dst"), col("cv")).agg(count(lit(1)).as("cnt"))
        .withColumn("cum", sum(col("cnt")).over(w))
        .groupBy(col("dst").as("v"))
        .agg(max(least(col("cum"), col("cv"))).as("c"))
    }
    c
  }

  /** current round body + eager localCheckpoint of the tiny carried
    * frame: execution becomes `iters` small adaptive queries over the
    * cached edges instead of one nested mega-plan AQE re-optimizes
    * after every stage. */
  private def corenessCkpt(edges: DataFrame, iters: Int): DataFrame = {
    val w = Window.partitionBy("src").orderBy(col("cv").desc)
    var c = edges.groupBy(col("src").as("v")).agg(count(lit(1)).as("c"))
    for (_ <- 1 to iters) {
      c = edges
        .join(c.select(col("v").as("dst"), col("c").as("cv")), "dst")
        .withColumn("rn", row_number().over(w).cast("long"))
        .groupBy(col("src").as("v"))
        .agg(max(least(col("rn"), col("cv"))).as("c"))
        .localCheckpoint(true)
    }
    c
  }

  private def kCoreCkpt(edges: DataFrame, k: Int, iters: Int): DataFrame = {
    var surv = edges.select(col("src").as("v")).distinct()
      .withColumn("deg", lit(0L))
    for (_ <- 1 to iters) {
      surv = edges
        .join(surv.select(col("v").as("dst")), Seq("dst"), "left_semi")
        .groupBy(col("src").as("v"))
        .agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= k)
        .localCheckpoint(true)
    }
    surv
  }

  private def diffCount(a: DataFrame, b: DataFrame): Long =
    a.exceptAll(b).count() + b.exceptAll(a).count()

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.create("graft-r21probe", s"local[$cpus]",
      Some(cpus.toInt))
    spark.sparkContext.setLogLevel("WARN")
    val mode = args.headOption.getOrElse("trio")

    if (mode == "ann") {
      // phase attribution of q174 (IVFADC build + search) at the
      // registered dials
      import operators.SimilarityInt
      val emb = Tables.embeddings(spark, dir)
        .repartition(spark.sparkContext.defaultParallelism)
      val z = SimilarityInt.zCodes(emb)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (_, tZ) = timeIt { z.count() }
      val (ivf, tCoarse) = timeIt {
        val i = SimilarityInt.ivfBuildInt(z, nlist = 64, iters = 2,
          seed = 42L, memoKey = "probe_ann_coarse")
        i.centroids.count(); i
      }
      val (_, tLists) = timeIt {
        ivf.lists.write.format("noop").mode("overwrite").save()
      }
      val resid = ivf.lists
        .join(broadcast(ivf.centroids), col("list_id") === col("cid"))
        .select(col("vid"), col("list_id"),
          expr("zip_with(z, cvec, (a, b) -> a - b)").as("z"))
      val (cb, tPq) = timeIt {
        val c = SimilarityInt.pqTrainInt(resid.select("vid", "z"), m = 8,
          ksub = 16, iters = 2, seed = 44L, memoKey = "probe_ann_pq")
        c.centroids.count(); c
      }
      val (idx, tBuildAll) = timeIt {
        val i = SimilarityInt.ivfPqBuildInt(z, nlist = 64, m = 8, ksub = 16,
          iters = 2, seed = 42L, memoKey = "probe_ann_full")
        i.codes.write.format("noop").mode("overwrite").save(); i
      }
      val zq = z.filter(col("vid") < 10)
      val (_, tSearch) = timeIt {
        SimilarityInt.ivfPqTopKInt(idx, zq, z, k = 10, nprobe = 16,
          rerank = 50).write.format("noop").mode("overwrite").save()
      }
      println(f"ann: z $tZ%.2f s, coarse-train $tCoarse%.2f s, " +
        f"lists $tLists%.2f s, pq-train $tPq%.2f s, " +
        f"FULL build $tBuildAll%.2f s, search $tSearch%.2f s")
      spark.stop()
      return
    }

    if (mode == "proj") {
      // stage attribution of coEngagementEdgesShared at minShared=22
      import ops.EventQueries
      val events = Tables.events(spark, dir)
      val minShared = 22L
      val uk = events.select(col("user_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .filter(col("k").isNotNull)
        .distinct()
      val kdf = uk.groupBy("k").agg(count(lit(1)).as("kdf"))
      val arrs = uk.join(kdf, "k")
        .groupBy("user_id")
        .agg(array_sort(collect_list(struct(col("kdf"), col("k")))).as("ks"))
        .withColumn("nk", size(col("ks")).cast("long"))
        .filter(col("nk") >= minShared)
      val prefixes = arrs.select(col("user_id"),
          explode(expr(s"slice(ks, 1, int(nk - $minShared + 1))")).as("p"))
        .select(col("user_id"), col("p.k").as("k"))
      val meets = prefixes.as("a").join(prefixes.as("b"),
          col("a.k") === col("b.k") && col("a.user_id") < col("b.user_id"))
        .select(col("a.user_id").as("u"), col("b.user_id").as("v"))
      val cands = meets.distinct()
      val flat = arrs.select(col("user_id"),
        expr("transform(ks, s -> s.k)").as("kk"))
      val p2 = cands
        .join(flat.select(col("user_id").as("u"), col("kk").as("k1")), "u")
        .join(flat.select(col("user_id").as("v"), col("kk").as("k2")), "v")
        .withColumn("n_shared",
          size(array_intersect(col("k1"), col("k2"))).cast("long"))
        .filter(col("n_shared") >= minShared)
        .select("u", "v", "n_shared")
      val (nuk, t1) = timeIt { uk.count() }
      val (narr, t2) = timeIt { arrs.count() }
      val (nm, t3) = timeIt { meets.write.format("noop").mode("overwrite").save() }
      val (nc, t4) = timeIt { cands.count() }
      val (np, t5) = timeIt { p2.write.format("noop").mode("overwrite").save() }
      val (_, t6) = timeIt {
        EventQueries.coEngagementEdgesShared(events, minShared)
          .write.format("noop").mode("overwrite").save()
      }
      val nMeet = meets.count()
      println(f"proj: uk=$nuk ($t1%.2f s) arrs=$narr ($t2%.2f s) " +
        f"meets=$nMeet (noop $t3%.2f s) cands=$nc ($t4%.2f s) " +
        f"verify (noop $t5%.2f s) full-cold ($t6%.2f s)")
      spark.stop()
      return
    }

    if (mode == "memocold") {
      // cold-build cost of the coeng memo, shape A (as-is) vs shape B
      // (repartition+sort): run each in a FRESH JVM (separate sbt run)
      val shape = args(1)
      val proj = ops.EventQueries.coEngagementEdgesShared(
        Tables.events(spark, dir), minShared = 22L)
      val p = spark.sparkContext.defaultParallelism
      val e = (shape match {
        case "B" => proj.repartition(p, col("src"))
          .sortWithinPartitions("src", "dst")
        case "BN" => proj.repartition(p, col("src"))
        case "BS" => proj.sortWithinPartitions("src", "dst")
        case "BC" => proj.localCheckpoint(true)
          .repartition(p, col("src")).sortWithinPartitions("src", "dst")
        case _ => proj
      }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (_, tMat) = timeIt { e.count() }
      val (nCore, tPeel) = timeIt {
        ops.TextQueries.kCore(e.select("src", "dst"), 70, 6)
          .write.format("noop").mode("overwrite").save()
      }
      val (_, tCor) = timeIt {
        ops.TextQueries.coreness(e.select("src", "dst"), 12)
          .write.format("noop").mode("overwrite").save()
      }
      val (kc, tPeelC) = timeIt {
        val d = kCoreCkpt(e.select("src", "dst"), 70, 6)
        d.write.format("noop").mode("overwrite").save(); d
      }
      val (cc, tCorC) = timeIt {
        val d = corenessCkpt(e.select("src", "dst"), 12)
        d.write.format("noop").mode("overwrite").save(); d
      }
      val dk = diffCount(kc, ops.TextQueries.kCore(e.select("src", "dst"), 70, 6))
      val dc = diffCount(cc, ops.TextQueries.coreness(e.select("src", "dst"), 12))
      println(f"memocold shape=$shape: materialize $tMat%.2f s, " +
        f"kcore $tPeel%.2f s, coreness $tCor%.2f s, " +
        f"kcoreCkpt $tPeelC%.2f s (diff $dk), corenessCkpt $tCorC%.2f s (diff $dc)")
      spark.stop()
      return
    }

    if (mode == "ktruss") {
      // instrumented copy of TextQueries.kTruss: per-round wall time +
      // job/stage counts, on the floor-32 frame the bench shape uses
      val proj = ops.EventQueries.coEngagementEdgesShared(
        Tables.events(spark, dir), minShared = 22L)
      val p = spark.sparkContext.defaultParallelism
      val eB = proj.repartition(p, col("src"))
        .sortWithinPartitions("src", "dst")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      eB.count()
      val edges = eB.filter(col("n_shared") >= 32L).select("src", "dst")
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val stages = new java.util.concurrent.atomic.AtomicInteger(0)
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobs.incrementAndGet()
          override def onStageCompleted(
              s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
            stages.incrementAndGet()
        })
      val (k, iters) = (6, 7)
      val tAll0 = System.nanoTime()
      var und = edges.filter(col("src") < col("dst"))
        .select(col("src").as("a"), col("dst").as("b"), lit(0L).as("support"))
        .localCheckpoint(true)
      println(f"init checkpoint: ${(System.nanoTime() - tAll0) / 1e9}%.2f s " +
        s"jobs=${jobs.get} stages=${stages.get} rows=${und.count()}")
      var removedV: DataFrame = null
      var i = 1
      var converged = false
      while (i <= iters && !converged) {
        val j0 = jobs.get; val s0 = stages.get; val t0 = System.nanoTime()
        val touched =
          if (i == 1) und
          else und.join(removedV, col("a") === col("rv"), "left_semi")
            .unionAll(und.join(removedV, col("a") === col("rv"), "left_anti")
              .join(removedV, col("b") === col("rv"), "left_semi"))
        val untouched =
          if (i == 1) und.limit(0)
          else und.join(removedV, col("a") === col("rv"), "left_anti")
            .join(removedV, col("b") === col("rv"), "left_anti")
        val sym = und.select(col("a").as("v"), col("b").as("w"))
          .unionAll(und.select(col("b").as("v"), col("a").as("w")))
        val needed =
          if (i == 1) null
          else sym.join(removedV, col("v") === col("rv"), "left_semi")
            .select(col("w").as("v"))
            .unionAll(removedV.select(col("rv").as("v")))
            .distinct()
        val symNeeded = if (i == 1) sym else sym.join(needed, Seq("v"), "left_semi")
        val adj = symNeeded.groupBy("v")
          .agg(sort_array(collect_list(col("w"))).as("nb"))
        val rec = touched
          .join(adj.select(col("v").as("a"), col("nb").as("na")), "a")
          .join(adj.select(col("v").as("b"), col("nb").as("nbb")), "b")
          .withColumn("support",
            size(array_intersect(col("na"), col("nbb"))).cast("long"))
          .select("a", "b", "support")
        val kept = rec.filter(col("support") >= k - 2)
        val dropped = rec.filter(col("support") < k - 2)
        und = untouched.select("a", "b", "support").unionAll(kept)
          .localCheckpoint(true)
        val tU = System.nanoTime()
        removedV = dropped.select(col("a").as("rv"))
          .unionAll(dropped.select(col("b").as("rv")))
          .distinct().localCheckpoint(true)
        val tR = System.nanoTime()
        converged = removedV.isEmpty
        println(f"round $i: und-ckpt ${(tU - t0) / 1e9}%.2f s, " +
          f"rm-ckpt ${(tR - tU) / 1e9}%.2f s, " +
          f"isEmpty ${(System.nanoTime() - tR) / 1e9}%.2f s, " +
          s"jobs=${jobs.get - j0} stages=${stages.get - s0}")
        i += 1
      }
      println(f"ktruss total ${(System.nanoTime() - tAll0) / 1e9}%.2f s " +
        s"jobs=${jobs.get} stages=${stages.get} out=${und.count()}")
      spark.stop()
      return
    }

    if (mode == "trio") {
      val proj = ops.EventQueries.coEngagementEdgesShared(
        Tables.events(spark, dir), minShared = 22L)
      val p = spark.sparkContext.defaultParallelism

      // memo shape A: as-is (current)
      val eA = proj.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (_, tMatA) = timeIt { eA.count() }
      // memo shape B: partitioned by src, sorted within partitions
      val eB = proj.repartition(p, col("src"))
        .sortWithinPartitions("src", "dst")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (_, tMatB) = timeIt { eB.count() }
      println(f"materialize: as-is $tMatA%.2f s, repart+sorted $tMatB%.2f s")

      def run(tag: String, f: => DataFrame): DataFrame = {
        spark.sparkContext.setJobDescription(tag)
        val (n, t) = timeIt {
          val d = f; d.write.format("noop").mode("overwrite").save(); d
        }
        val (_, t2) = timeIt { n.write.format("noop").mode("overwrite").save() }
        println(f"$tag%-28s $t%.2f s (2nd $t2%.2f s)")
        n
      }

      val a1 = run("kcore cur on A", kCoreCur(eA.select("src", "dst"), 70, 6))
      val a2 = run("kcore cur on B", kCoreCur(eB.select("src", "dst"), 70, 6))
      val a3 = run("kcore flip on B", kCoreFlip(eB.select("src", "dst"), 70, 6))
      println(s"kcore equal: curB=${diffCount(a1, a2)} flipB=${diffCount(a1, a3)}")

      val c1 = run("coreness cur on A", corenessCur(eA.select("src", "dst"), 12))
      val c2 = run("coreness flip on B", corenessFlip(eB.select("src", "dst"), 12))
      val c3 = run("coreness cur on B", corenessCur(eB.select("src", "dst"), 12))
      println(s"coreness equal: flipB=${diffCount(c1, c2)} curB=${diffCount(c1, c3)}")

      val t1 = run("ktruss cur on A(>=32)",
        ops.TextQueries.kTruss(
          eA.filter(col("n_shared") >= 32L).select("src", "dst"), 6, 7))
      val t2b = run("ktruss cur on B(>=32)",
        ops.TextQueries.kTruss(
          eB.filter(col("n_shared") >= 32L).select("src", "dst"), 6, 7))
      println(s"ktruss equal: ${diffCount(t1, t2b)}; edges32=" +
        eB.filter(col("n_shared") >= 32L).count())
    }

    spark.stop()
  }
}
