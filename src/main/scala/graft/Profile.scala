package graft

import org.apache.spark.sql.functions._

import graft.pipeline.{Extract, ExtractTurn, Turn}

/** Dev-only profiling harness (not part of the driver contract).
  * `runMain graft.Profile spark <cores> <replicate>` — stage-level timings.
  * `runMain graft.Profile micro` — single-thread per-phase ns/turn.
  */
object Profile {

  private def sparkProfile(cores: Int, rep: Int): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", (64 << 10).toString)
      .config("spark.sql.files.openCostInBytes", (16 << 10).toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def turns = {
      val t0 = Extract.readTranscripts(spark, "/root/repo/data/transcripts_bench")
      import spark.implicits._
      t0.toDF()
        .withColumn("rep", explode(sequence(lit(0), lit(rep - 1))))
        .withColumn("conv_id", concat(col("conv_id"), lit("#"), col("rep")))
        .select("conv_id", "turn_idx", "role", "text", "tool")
        .as[Turn]
    }
    def t(name: String)(f: => Any): Unit = {
      val gcb = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      var gc0 = 0L; gcb.forEach(b => gc0 += b.getCollectionTime)
      val t0 = System.nanoTime(); f
      var gc1 = 0L; gcb.forEach(b => gc1 += b.getCollectionTime)
      println(f"PROF $name ${(System.nanoTime() - t0) / 1e9}%.2f s  gc=${(gc1 - gc0) / 1000.0}%.2f s")
    }
    Extract.extract(turns.limit(50000)).toDF().count()
    t("scan_explode")(turns.toDF().agg(sum(length(col("text")))).collect())
    t("extract_full")(Extract.extract(turns).toDF()
      .agg(count(lit(1)), sum(length(coalesce(col("md"), lit(""))))).collect())
    t("extract_full2")(Extract.extract(turns).toDF()
      .agg(count(lit(1)), sum(length(coalesce(col("md"), lit(""))))).collect())
    spark.stop()
  }

  private def microProfile(): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = Extract.readTranscripts(spark, "/root/repo/data/transcripts_t2").collect()
    spark.stop()
    val n = rows.length
    // allocation counters are a HotSpot extension; fall back to time-only
    // reporting on JVMs that don't expose com.sun.management.ThreadMXBean
    val tmx: Option[com.sun.management.ThreadMXBean] =
      java.lang.management.ManagementFactory.getThreadMXBean match {
        case t: com.sun.management.ThreadMXBean => Some(t)
        case _ => None
      }
    def bench(name: String, reps: Int)(f: Turn => Any): Unit = {
      var i = 0
      while (i < 2) { rows.foreach(f); i += 1 } // warmup
      val tid = Thread.currentThread().getId
      val a0 = tmx.fold(0L)(_.getThreadAllocatedBytes(tid))
      val t0 = System.nanoTime()
      i = 0
      while (i < reps) { rows.foreach(f); i += 1 }
      val perTurn = (System.nanoTime() - t0).toDouble / (n.toLong * reps)
      val alloc = tmx.fold("n/a") { t =>
        f"${(t.getThreadAllocatedBytes(tid) - a0).toDouble / (n.toLong * reps)}%.0f B/turn"
      }
      println(f"MICRO $name ${perTurn / 1000}%.2f us/turn  alloc $alloc")
    }
    bench("full_extract", 5)(ExtractTurn.apply)
    val fusedHits = rows.count { t =>
      val (oh, ow) = graft.pipeline.PageGeom.of(t.conv_id, t.turn_idx)
      val (ih, iw) = graft.geom.SmartResize.smartResize(oh, ow)
      val (ih2, iw2) = graft.geom.SmartResize.smartResize(ih, iw)
      graft.pipeline.ExtractTurn.LayoutModes.contains(t.tool) &&
        graft.json.StrictFast.transcode(t.text,
          iw2.toDouble / ow, ih2.toDouble / oh).isInstanceOf[graft.json.StrictFast.Ok]
    }
    println(s"MICRO fused_hits $fusedHits of $n")
    val fusedRows = rows.filter { t =>
      val (oh, ow) = graft.pipeline.PageGeom.of(t.conv_id, t.turn_idx)
      val (ih, iw) = graft.geom.SmartResize.smartResize(oh, ow)
      val (ih2, iw2) = graft.geom.SmartResize.smartResize(ih, iw)
      graft.pipeline.ExtractTurn.LayoutModes.contains(t.tool) &&
        graft.json.StrictFast.transcode(t.text,
          iw2.toDouble / ow, ih2.toDouble / oh).isInstanceOf[graft.json.StrictFast.Ok]
    }
    // same-JVM INTERLEAVED A/B (min-of-rounds): host capacity drifts too
    // much for cross-run — or even sequential same-JVM — comparison
    def abRows(name: String, rs: Array[Turn], rounds: Int): Unit = {
      val tid = Thread.currentThread().getId
      var i = 0
      while (i < 2) { rs.foreach(ExtractTurn.apply); i += 1 } // warmup
      var bestA = Double.MaxValue; var bestB = Double.MaxValue
      var allocA = Double.MaxValue; var allocB = Double.MaxValue
      for (_ <- 0 until rounds; fused <- Seq(true, false)) {
        graft.pipeline.ExtractTurn.strictFastEnabled = fused
        val a0 = tmx.fold(0L)(_.getThreadAllocatedBytes(tid))
        val t0 = System.nanoTime()
        rs.foreach(ExtractTurn.apply)
        val per = (System.nanoTime() - t0).toDouble / rs.length
        val al = tmx.fold(0.0)(t =>
          (t.getThreadAllocatedBytes(tid) - a0).toDouble / rs.length)
        if (fused) { bestA = math.min(bestA, per); allocA = math.min(allocA, al) }
        else { bestB = math.min(bestB, per); allocB = math.min(allocB, al) }
      }
      graft.pipeline.ExtractTurn.strictFastEnabled = true
      println(f"MICRO $name n=${rs.length} fused ${bestA / 1000}%.2f us/row ${allocA}%.0f B  old ${bestB / 1000}%.2f us/row ${allocB}%.0f B  speedup ${bestB / bestA}%.2fx")
    }
    abRows("AB_fused_subset", fusedRows, 6)
    abRows("AB_full_corpus", rows, 6)

    // interleaved A/B of the fused repair ladder (StrictRepair) over the
    // trailing-comma class and the full corpus
    val trailRows = rows.filter { t =>
      val (oh, ow) = graft.pipeline.PageGeom.of(t.conv_id, t.turn_idx)
      val (ih, iw) = graft.geom.SmartResize.smartResize(oh, ow)
      val (ih2, iw2) = graft.geom.SmartResize.smartResize(ih, iw)
      graft.pipeline.ExtractTurn.LayoutModes.contains(t.tool) &&
        (graft.json.StrictFast.transcode(t.text,
          iw2.toDouble / ow, ih2.toDouble / oh) eq graft.json.StrictFast.ParseFailTrail)
    }
    def abRepair(name: String, rs: Array[Turn], rounds: Int): Unit = {
      if (rs.isEmpty) { println(s"MICRO $name n=0 (no trailing-comma rows)"); return }
      val tid = Thread.currentThread().getId
      var i = 0
      while (i < 2) { rs.foreach(ExtractTurn.apply); i += 1 } // warmup
      var bestA = Double.MaxValue; var bestB = Double.MaxValue
      var allocA = Double.MaxValue; var allocB = Double.MaxValue
      for (_ <- 0 until rounds; fused <- Seq(true, false)) {
        graft.pipeline.ExtractTurn.strictRepairEnabled = fused
        val a0 = tmx.fold(0L)(_.getThreadAllocatedBytes(tid))
        val t0 = System.nanoTime()
        rs.foreach(ExtractTurn.apply)
        val per = (System.nanoTime() - t0).toDouble / rs.length
        val al = tmx.fold(0.0)(t =>
          (t.getThreadAllocatedBytes(tid) - a0).toDouble / rs.length)
        if (fused) { bestA = math.min(bestA, per); allocA = math.min(allocA, al) }
        else { bestB = math.min(bestB, per); allocB = math.min(allocB, al) }
      }
      graft.pipeline.ExtractTurn.strictRepairEnabled = true
      println(f"MICRO $name n=${rs.length} fused ${bestA / 1000}%.2f us/row ${allocA}%.0f B  ladder ${bestB / 1000}%.2f us/row ${allocB}%.0f B  speedup ${bestB / bestA}%.2fx")
    }
    abRepair("AB_repair_trail_class", trailRows, 6)
    abRepair("AB_repair_full_corpus", rows, 4)

    // big-repair-row ladder stage breakdown (the >10KB tail is ~30% of
    // corpus time; find where it goes before optimizing anything)
    {
      import graft.clean.OutputCleaner
      val big = rows.filter(t => t.text.length > 10000 &&
        ExtractTurn.LayoutModes.contains(t.tool))
      if (big.nonEmpty) {
        def stage(name: String)(f: String => Any): Unit = {
          var i = 0
          while (i < 2) { big.foreach(t => f(t.text)); i += 1 }
          val t0 = System.nanoTime()
          i = 0
          while (i < 5) { big.foreach(t => f(t.text)); i += 1 }
          println(f"MICRO bigstage_$name ${(System.nanoTime() - t0) / 1e3 / (big.length * 5)}%.1f us/row")
        }
        stage("transcode_bail")(s => graft.json.StrictFast.transcode(s, 1.0, 1.0))
        stage("fix_delims")(OutputCleaner.fixMissingDelimiters)
        stage("truncate")(s => OutputCleaner.truncateLastIncompleteElement(
          OutputCleaner.fixMissingDelimiters(s)._1))
        val pre = big.map(t => OutputCleaner.truncateLastIncompleteElement(
          OutputCleaner.fixMissingDelimiters(t.text)._1)._1)
        def stage2(name: String)(f: String => Any): Unit = {
          var i = 0
          while (i < 2) { pre.foreach(f); i += 1 }
          val t0 = System.nanoTime()
          i = 0
          while (i < 5) { pre.foreach(f); i += 1 }
          println(f"MICRO bigstage_$name ${(System.nanoTime() - t0) / 1e3 / (pre.length * 5)}%.1f us/row")
        }
        stage2("dedup_dicts")(OutputCleaner.removeDuplicateCompleteDictsPreserveOrder)
        val post = pre.map(s => OutputCleaner.ensureJsonFormat(
          OutputCleaner.removeDuplicateCompleteDictsPreserveOrder(s)._1))
        def stage3(name: String)(f: String => Any): Unit = {
          var i = 0
          while (i < 2) { post.foreach(f); i += 1 }
          val t0 = System.nanoTime()
          i = 0
          while (i < 5) { post.foreach(f); i += 1 }
          println(f"MICRO bigstage_$name ${(System.nanoTime() - t0) / 1e3 / (post.length * 5)}%.1f us/row")
        }
        stage3("parse_final")(s =>
          try OutputCleaner.parseFinalJson(s) catch { case _: Exception => None })
        val lists = post.flatMap(s =>
          try OutputCleaner.parseFinalJson(s) catch { case _: Exception => None })
        println(s"MICRO bigstage_parsed_lists n=${lists.length} avgCells=${
          if (lists.nonEmpty) lists.map(_.length).sum / lists.length else 0}")
        locally {
          var i = 0
          while (i < 2) { lists.foreach(OutputCleaner.removeDuplicateCategoryTextPairsAndBbox); i += 1 }
          val t0 = System.nanoTime()
          i = 0
          while (i < 5) { lists.foreach(OutputCleaner.removeDuplicateCategoryTextPairsAndBbox); i += 1 }
          println(f"MICRO bigstage_c9_dedup ${(System.nanoTime() - t0) / 1e3 / (lists.length.max(1) * 5)}%.1f us/row")
        }
        val shapeBig = big.count(t => graft.json.StrictFast.transcode(t.text, 1.0, 1.0) == graft.json.StrictFast.ShapeFail)
        println(s"MICRO bigstage_shapefail $shapeBig of ${big.length}")
        val avgBigLen = big.map(_.text.length.toLong).sum / big.length
        println(s"MICRO bigstage_avg_chars $avgBigLen")
        val t0 = System.nanoTime()
        (0 until 5).foreach(_ => big.foreach(ExtractTurn.apply))
        println(f"MICRO bigstage_full_apply ${(System.nanoTime() - t0) / 1e3 / (big.length * 5)}%.1f us/row")
      }
    }
    bench("strict_fast_only", 5) { t =>
      graft.json.StrictFast.transcode(t.text, 1.0, 1.0)
    }
    bench("pyjson_parse_only", 5) { t =>
      try graft.json.PyJson.parse(t.text) catch { case _: Exception => null }
    }
    bench("parse+dump", 5) { t =>
      try graft.json.PyJson.dumps(graft.json.PyJson.parse(t.text))
      catch { case _: Exception => null }
    }
    bench("geom_only", 5)(t => graft.pipeline.PageGeom.of(t.conv_id, t.turn_idx))
    val avgLen = rows.map(_.text.length.toLong).sum / n
    println(s"MICRO avg_payload_chars $avgLen")

    // stage splits over the strictly-parsing subset (cells pre-rescaled)
    import graft.json.{JArr, JValue}
    import graft.pipeline.PageGeom
    import graft.geom.SmartResize
    val parsed: Array[(Turn, Vector[JValue])] = rows.flatMap { t =>
      if (t.tool == "prompt_layout_all_en") {
        try {
          val (oh, ow) = PageGeom.of(t.conv_id, t.turn_idx)
          val (ih, iw) = SmartResize.smartResize(oh, ow)
          graft.json.PyJson.parse(t.text) match {
            case JArr(xs) => Some((t, ExtractTurn.postProcessCells(xs, ow, oh, iw, ih)))
            case _        => None
          }
        } catch { case _: Exception => None }
      } else None
    }
    val pn = parsed.length
    println(s"MICRO strict_parse_rows $pn")
    def bench2(name: String, reps: Int)(f: ((Turn, Vector[JValue])) => Any): Unit = {
      var i = 0
      while (i < 2) { parsed.foreach(f); i += 1 }
      val tid = Thread.currentThread().getId
      val a0 = tmx.fold(0L)(_.getThreadAllocatedBytes(tid))
      val t0 = System.nanoTime()
      i = 0
      while (i < reps) { parsed.foreach(f); i += 1 }
      val perTurn = (System.nanoTime() - t0).toDouble / (pn.toLong * reps)
      val alloc = tmx.fold("n/a") { t =>
        f"${(t.getThreadAllocatedBytes(tid) - a0).toDouble / (pn.toLong * reps)}%.0f B/row"
      }
      println(f"MICRO $name ${perTurn / 1000}%.2f us/row  alloc $alloc")
    }
    // repair-path cost split: rows whose strict parse fails, by size bucket
    val strictIds = parsed.map(_._1).map(t => (t.conv_id, t.turn_idx)).toSet
    val layoutRows = rows.filter(t => ExtractTurn.LayoutModes.contains(t.tool))
    val repairRows = layoutRows.filterNot(t => strictIds.contains((t.conv_id, t.turn_idx)))
    val (repairBig, repairSmall) = repairRows.partition(_.text.length > 10000)
    def benchRows(name: String, rs: Array[Turn], reps: Int): Unit = {
      if (rs.isEmpty) return
      var i = 0
      while (i < 1) { rs.foreach(ExtractTurn.apply); i += 1 }
      val t0 = System.nanoTime()
      i = 0
      while (i < reps) { rs.foreach(ExtractTurn.apply); i += 1 }
      val per = (System.nanoTime() - t0).toDouble / (rs.length.toLong * reps)
      println(f"MICRO $name n=${rs.length} ${per / 1000}%.2f us/row")
    }
    benchRows("repair_small(<=10k)", repairSmall, 3)
    benchRows("repair_big(>10k)", repairBig, 3)

    bench2("rescale_only", 5) { case (t, _) =>
      val (oh, ow) = PageGeom.of(t.conv_id, t.turn_idx)
      val (ih, iw) = SmartResize.smartResize(oh, ow)
      graft.json.PyJson.parse(t.text) match {
        case JArr(xs) => ExtractTurn.postProcessCells(xs, ow, oh, iw, ih)
        case _        => null
      }
    }
    bench2("dump_only", 5) { case (_, cells) => graft.json.PyJson.dumps(JArr(cells)) }
    bench2("render_only", 5) { case (_, cells) =>
      graft.render.FormatTransformer.layoutJsonToMdBoth(cells)
    }
  }

  /** Quick single-query ops timing (best-of-2 warm, like the bench suite)
    * without the full Bench run: `runMain graft.Profile ops <sfDir> [q...]`.
    */
  private def opsProfile(sfDir: String, qs: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (qs.nonEmpty) qs
    else Array("doc_near_dups", "doc_dedup_keepers", "doc_simhash_pairs")
    names.foreach { name =>
      var best = Double.MaxValue
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        graft.ops.CacheLedger.release()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      println(f"PROF_OPS $name ${best}%.2f s (best of 2)")
    }
    spark.stop()
  }

  def main(args: Array[String]): Unit = args.headOption match {
    case Some("micro") => microProfile()
    case Some("spark") => sparkProfile(args(1).toInt, args(2).toInt)
    case Some("ops")   => opsProfile(args(1), args.drop(2))
    case _ => sparkProfile(32, 36)
  }
}
