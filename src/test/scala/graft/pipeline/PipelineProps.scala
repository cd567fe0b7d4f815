package graft.pipeline

import java.sql.Timestamp
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based checks (an upgrade over the reference's example-based
  * RSpec suite, SURVEY.md §5): the distributed prefix-scan primitives
  * must equal their naive single-window definitions for ARBITRARY
  * inputs and chunk sizes, routing must partition any input, and the
  * literal watermark predicate must implement exactly the
  * (day unseen) OR (ts > wm) semantics.
  */
object PipelineProps extends Properties("pipeline") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val genRows: Gen[List[(String, Int, Int)]] = for {
    nConvs <- Gen.choose(1, 4)
    rows <- Gen.listOfN(60, for {
      c <- Gen.choose(0, nConvs - 1)
      v <- Gen.choose(0, 3)
    } yield (s"c$c", v))
  } yield rows.groupBy(_._1).toList.flatMap { case (c, vs) =>
    vs.zipWithIndex.map { case ((_, v), i) => (c, i, v) }
  }

  private val genChunk: Gen[Int] = Gen.choose(1, 9)

  property("prefixSum == naive running sum for any input and chunk size") =
    forAll(genRows, genChunk) { (rows, chunk) =>
      rows.isEmpty || {
        val df = rows.toDF("conv_id", "turn_idx", "v")
        val got = PrefixOps.prefixSum(df, col("v"), "run", chunkSize = chunk)
          .select($"conv_id", $"turn_idx", $"run")
        val w = Window.partitionBy($"conv_id").orderBy($"turn_idx")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val naive = df.withColumn("run", sum($"v".cast("long")).over(w))
          .select($"conv_id", $"turn_idx", $"run")
        got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty
      }
    }

  property("propagateLastNonNull == naive ignoreNulls window") =
    forAll(genRows, genChunk) { (rows, chunk) =>
      rows.isEmpty || {
        // v == 0 -> null marker, else a string value
        val df = rows.toDF("conv_id", "turn_idx", "v")
          .withColumn("mark", when($"v" > 0, concat(lit("m"), $"v")))
        val got = PrefixOps.propagateLastNonNull(df, col("mark"), "hdr",
            chunkSize = chunk)
          .select($"conv_id", $"turn_idx", $"hdr")
        val w = Window.partitionBy($"conv_id").orderBy($"turn_idx")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val naive = df
          .withColumn("hdr", last($"mark", ignoreNulls = true).over(w))
          .select($"conv_id", $"turn_idx", $"hdr")
        got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty
      }
    }

  private val genText: Gen[String] = Gen.oneOf(
    Gen.const("2025-01-01T00:00:00Z INFO [user] plain body"),
    Gen.const("#Version: 9"),
    Gen.const("#Fields: a b"),
    Gen.const("   continuation line"),
    Gen.const("@@garbage not a log line"),
    Gen.alphaNumStr.map(s => s"junk $s"))

  private val genRole: Gen[String] =
    Gen.oneOf("user", "assistant", "tool", "system", "alien", "")

  property("lagGatedPrefixSum == lagOne -> prefixSum composition " +
      "(the r9 fused what=next scan) for any input and chunk size") =
    forAll(genRows, genChunk) { (rows, chunk) =>
      rows.isEmpty || {
        val df = rows.toDF("conv_id", "turn_idx", "v")
        val belongs = $"v" > 1
        val fused = PrefixOps.lagGatedPrefixSum(df, belongs, "sid",
            chunkSize = chunk)
          .select($"conv_id", $"turn_idx", $"sid")
        val composed = PrefixOps.prefixSum(
            PrefixOps.lagOne(df, belongs, "_pb", chunkSize = chunk),
            when(coalesce($"_pb", lit(false)), lit(0)).otherwise(lit(1)),
            "sid", chunkSize = chunk)
          .select($"conv_id", $"turn_idx", $"sid")
        fused.exceptAll(composed).isEmpty &&
          composed.exceptAll(fused).isEmpty
      }
    }

  property("routing assigns every row exactly one known sink") =
    forAll(Gen.listOfN(40, Gen.zip(genRole, genText)),
      Gen.oneOf("", "junk", "body", "\\d+")) { (rows, pattern) =>
      rows.isEmpty || {
        val ts0 = new Timestamp(Synth.baseEpochMs)
        val turns = rows.zipWithIndex.map { case ((r, t), i) =>
          Turn(s"c${i % 3}", i, r, t, null, ts0)
        }.toDS()
        val routed = Route(Parse(turns), excludePattern = pattern)
        val n = routed.count()
        val sinks = routed.groupBy($"sink").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        n == rows.size && sinks.values.sum == n &&
          sinks.keySet.subsetOf(Route.sinkNames.toSet)
      }
    }

  property("sessionizeConfigured == naive window for any pattern/negate/what/chunk") =
    forAll(
      Gen.listOfN(30, Gen.oneOf("SEP", "data line", "  pad", "SEP tail")),
      Gen.oneOf(true, false),
      Gen.oneOf("previous", "next"),
      genChunk) { (texts, negate, what, chunk) =>
      texts.isEmpty || {
        val ts0 = new Timestamp(Synth.baseEpochMs)
        val df = texts.zipWithIndex.map { case (t, i) =>
          Turn(s"c${i % 2}", i, "user", t, null, ts0)
        }.toDS().toDF()
        val cfg = Parse.MultilineConfig("^SEP", negate, what)
        val got = Parse.sessionizeConfigured(df, cfg, chunkSize = chunk)
          .select($"conv_id", $"turn_idx", $"session_id")
        val w = Window.partitionBy($"conv_id").orderBy($"turn_idx")
        val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val matches = $"text".rlike("^SEP")
        val belongs = if (negate) !matches else matches
        val start = what match {
          case "previous" => when(belongs, 0L).otherwise(1L)
          case "next" =>
            when(coalesce(lag(belongs, 1).over(w), lit(false)), 0L)
              .otherwise(1L)
        }
        val naive = df.withColumn("_start", start)
          .withColumn("session_id", sum($"_start").over(wRun))
          .select($"conv_id", $"turn_idx", $"session_id")
        got.exceptAll(naive).isEmpty && naive.exceptAll(got).isEmpty
      }
    }

  property("S6 split is a PARTITION of the delta: eligible + deferred == " +
      "unfiltered, disjoint, for arbitrary class/header combos") =
    forAll(Gen.listOfN(15, Gen.zip(
      Gen.oneOf(List("STANDARD", "GLACIER", "DEEP_ARCHIVE", null)),
      Gen.oneOf(List(null,
        "ongoing-request=\"false\", expiry-date=\"2027-01-01 00:00:00\"",
        "ongoing-request=\"true\", expiry-date=\"2027-01-01 00:00:00\"",
        "ongoing-request=\"false\", expiry-date=\"2020-01-01 00:00:00\"",
        "not a restore header"))))) { rows =>
      rows.isEmpty || {
        val dir = java.nio.file.Files.createTempDirectory(
          java.nio.file.Paths.get("/root/repo/target"), "s6prop").toString
        try {
          val ts0 = new Timestamp(Synth.baseEpochMs)
          rows.zipWithIndex.map { case ((sc, rh), i) =>
            (s"p$i", 0, "user", s"2025-01-01T00:00:00Z INFO [user] r$i",
              null: String, ts0, sc, rh, "2025-01-01")
          }.toDF("conv_id", "turn_idx", "role", "text", "tool", "ts",
              "storage_class", "restore_hdr", "day")
            .write.mode("overwrite").partitionBy("day").parquet(dir)
          val asOf = new Timestamp(Synth.baseEpochMs + 86400000L)
          val cfg = PipelineConfig(dir, s"$dir-sinks",
            storageClassCol = "storage_class",
            restoreHeaderCol = "restore_hdr")
          val (elig, defer) = Discover.deltaAndDeferred(spark, cfg, asOf,
            Map.empty)
          def ids(df: org.apache.spark.sql.DataFrame) =
            df.select($"conv_id").collect().map(_.getString(0)).toSet
          val all = ids(Discover.delta(spark,
            cfg.copy(storageClassCol = null, restoreHeaderCol = null),
            asOf, Map.empty))
          val (e, d) = (ids(elig), ids(defer))
          (e ++ d) == all && (e & d).isEmpty
        } finally org.apache.commons.io.FileUtils
          .deleteQuietly(new java.io.File(dir))
      }
    }

  property("literal watermark predicate == reference semantics") =
    forAll(
      Gen.listOfN(30, Gen.zip(Gen.choose(1, 5), Gen.choose(0L, 100L))),
      Gen.mapOf(Gen.zip(Gen.choose(1, 5).map(d => f"2025-01-$d%02d"),
        Gen.choose(0L, 100L).map(s => new Timestamp(s * 1000L))))) {
      (rows, wms) =>
      rows.isEmpty || {
        val df = rows.zipWithIndex.map { case ((d, s), i) =>
          (i, f"2025-01-$d%02d", new Timestamp(s * 1000L))
        }.toDF("id", "day", "ts")
        val got =
          if (wms.isEmpty) df else df.filter(Discover.watermarkPredicate(wms))
        val expect = rows.zipWithIndex.filter { case ((d, s), _) =>
          wms.get(f"2025-01-$d%02d") match {
            case None => true
            case Some(wm) => s * 1000L > wm.getTime
          }
        }.map(_._2).toSet
        got.select($"id").collect().map(_.getInt(0)).toSet == expect
      }
    }

  property("resolveClusters == reference union-find for any pair graph") =
    forAll(Gen.listOfN(25,
      Gen.zip(Gen.choose(0, 15), Gen.choose(0, 15)))) { rawPairs =>
      val pairs = rawPairs.collect { case (a, b) if a != b =>
        (f"n$a%02d", f"n$b%02d")
      }
      pairs.isEmpty || {
        // reference: driver-side union-find over the same undirected graph
        val parent = scala.collection.mutable.Map[String, String]()
        def find(x: String): String = {
          val p = parent.getOrElseUpdate(x, x)
          if (p == x) x else { val r = find(p); parent(x) = r; r }
        }
        def union(a: String, b: String): Unit = {
          val (ra, rb) = (find(a), find(b))
          if (ra != rb) parent(math.Ordering.String.max(ra, rb)) =
            math.Ordering.String.min(ra, rb)
        }
        pairs.foreach { case (a, b) => union(a, b) }
        val expect = parent.keys
          .map(n => n -> find(n)).toMap // min id per component by union rule
        val res = graft.ops.Dedup.resolveClustersIter(
          pairs.toDF("id_a", "id_b"))
        val got = res.labels.collect()
          .map(r => r.getString(0) -> (r.getString(1), r.getBoolean(2)))
          .toMap
        res.release()
        res.converged &&
          got.keySet == expect.keySet &&
          got.forall { case (id, (label, keep)) =>
            label == expect(id) && keep == (id == label)
          }
      }
    }
}
