package graft

/** Per-query bench regression guard (SURVEY §8b (f)).
  *
  * The shared bench box drifts (BASELINE.md: identical binaries re-benched
  * 47.5 → 54.8 s within one round), so absolute thresholds flag phantom
  * regressions. The guard instead normalizes by the run's own drift: the
  * MEDIAN per-query ratio vs the anchor set estimates the box factor
  * (robust — a real regression moves one ratio, not the median), and a
  * query is flagged only when its ratio exceeds `relThreshold ×` that
  * median AND its absolute time clears a noise floor (sub-second queries
  * are scheduling-noise-dominated at sf0.1).
  */
object BenchGuard {

  final case class Report(
      driftFactor: Double,
      /** (query, anchorSec, currentSec, ratioVsDriftedAnchor). */
      flagged: Seq[(String, Double, Double, Double)],
      /** Anchored queries absent or failed (-1) in the current run. */
      missing: Seq[String],
      comparedCount: Int,
      /** Per-family drift factors actually applied (§8c(m)); empty for
        * the flat [[evaluate]] path. */
      familyDrift: Map[String, Double] = Map.empty) {
    def ok: Boolean = flagged.isEmpty && missing.isEmpty
  }

  /** Bench family of a query name (§8c(m)): the box's noise profile is
    * not uniform — the relational set is shuffle-bound (sensitive to
    * memory-bandwidth contention), the text/dedup set is codegen-CPU-bound
    * (sensitive to core stealing), the ANN set is broadcast-heavy — so
    * each family's drift is estimated from its own queries. */
  private[graft] def family(name: String): String = name.takeWhile(_ != '_') match {
    case t if t.startsWith("q") => "relational"
    case "docs" | "text" => "text"
    case "dedup" => "dedup"
    case "ann" => "ann"
    case "csr" => "csr"
    case "events" => "events"
    case _ => "misc" // mm, ngs, ontology, sync, zone — small, shared profile
  }

  /** Pure comparison — no clocks, fully spec-testable. */
  def evaluate(anchors: Map[String, Double], current: Map[String, Double],
               relThreshold: Double = 2.0, floorSec: Double = 1.0): Report = {
    val valid = current.filter(_._2 >= 0)
    val common = anchors.keySet.intersect(valid.keySet).toSeq.sorted
    val missing = anchors.keySet.diff(valid.keySet).toSeq.sorted
    if (common.isEmpty) return Report(1.0, Nil, missing, 0)
    val ratios = common.map(q => valid(q) / anchors(q)).sorted
    val drift = {
      val n = ratios.length
      if (n % 2 == 1) ratios(n / 2) else (ratios(n / 2 - 1) + ratios(n / 2)) / 2
    }
    val flagged = common.flatMap { q =>
      val ratio = valid(q) / (anchors(q) * drift)
      if (ratio > relThreshold && valid(q) > floorSec)
        Some((q, anchors(q), valid(q), ratio))
      else None
    }.sortBy(-_._4)
    Report(drift, flagged, missing, common.length)
  }

  /** §8c(m) — per-family drift normalization: like [[evaluate]], but each
    * query is compared against its FAMILY's median ratio when the family
    * has at least `minFamily` anchored queries (enough for a robust
    * median), falling back to the global median otherwise. A box where
    * only the shuffle-bound relational family slowed 1.8× no longer
    * inflates the drift allowance of a genuinely regressed ANN query —
    * and vice versa. */
  def evaluateByFamily(anchors: Map[String, Double], current: Map[String, Double],
                       relThreshold: Double = 2.0, floorSec: Double = 1.0,
                       minFamily: Int = 5): Report = {
    val valid = current.filter(_._2 >= 0)
    val common = anchors.keySet.intersect(valid.keySet).toSeq.sorted
    val missing = anchors.keySet.diff(valid.keySet).toSeq.sorted
    if (common.isEmpty) return Report(1.0, Nil, missing, 0)
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2
    }
    val globalDrift = median(common.map(q => valid(q) / anchors(q)))
    val byFamily = common.groupBy(family)
    val familyDrift = byFamily.map { case (f, qs) =>
      f -> (if (qs.length >= minFamily) median(qs.map(q => valid(q) / anchors(q)))
            else globalDrift)
    }
    val flagged = common.flatMap { q =>
      val ratio = valid(q) / (anchors(q) * familyDrift(family(q)))
      if (ratio > relThreshold && valid(q) > floorSec)
        Some((q, anchors(q), valid(q), ratio))
      else None
    }.sortBy(-_._4)
    Report(globalDrift, flagged, missing, common.length, familyDrift)
  }

  /** One adjudicated flag: the isolated re-run time plus the verdict. */
  final case class Adjudication(
      query: String,
      anchorSec: Double,
      sweepSec: Double,
      isolatedSec: Double,
      /** re-run ratio vs the SAME drifted anchor the flag used. */
      isolatedRatio: Double,
      confirmed: Boolean)

  /** §r05(1) — self-adjudication of guard flags. A full-sweep flag can be
    * an ordering artifact (the flagged query absorbed the run's first scan
    * of a big table — the r04 csr-family pathology, proven by manual
    * isolated re-bench) rather than a plan regression. This automates that
    * manual step: each flagged query is re-run ONCE in isolation via
    * `rerun`, and the flag is CONFIRMED only if the isolated time still
    * exceeds `relThreshold ×` its drifted anchor; otherwise it reports as
    * ordering noise. `rerun` is injected so the comparison logic stays
    * pure and spec-testable (a re-run that fails, -1, counts as
    * confirmed — a query that stopped working is never noise).
    *
    * Adjudication re-runs execute in the SWEEP'S OWN JVM: they clear the
    * Spark-side state (cache, Cached registry) but not JVM-level state —
    * code-cache pressure, metaspace, GC geometry after 200+ query
    * compilations. A flag whose isolated re-run stays slow here can
    * therefore still be late-sweep JVM state, not a plan regression
    * (r07d: events_overlapping_stays read 4.5 s in-JVM vs 1.1 s in a
    * fresh JVM, anchor 0.8). REGRESSION-CONFIRMED means "survived
    * in-process isolation"; the final arbiter for a confirmed flag is a
    * fresh-JVM single-query run before touching the anchor. */
  def adjudicate(report: Report, rerun: String => Double,
                 relThreshold: Double = 2.0): Seq[Adjudication] =
    report.flagged.map { case (q, anchor, sweepSec, _) =>
      val drifted = anchor * report.familyDrift.getOrElse(family(q), report.driftFactor)
      val iso = rerun(q)
      val ratio = if (iso < 0) Double.PositiveInfinity else iso / drifted
      Adjudication(q, anchor, sweepSec, iso, ratio, confirmed = ratio > relThreshold)
    }

  def renderAdjudication(verdicts: Seq[Adjudication]): String =
    verdicts.map { a =>
      val tag = if (a.confirmed) "REGRESSION-CONFIRMED" else "ORDERING-NOISE"
      f"[bench-guard] $tag ${a.query}: sweep ${a.sweepSec}%.2fs, isolated ${a.isolatedSec}%.2fs " +
        f"(${a.isolatedRatio}%.1fx over drifted anchor ${a.anchorSec}%.2fs)"
    }.mkString("\n")

  /** Flat `{"name": seconds, ...}` JSON (the bench_anchors.json format;
    * names are snake_case so the tokenizer is unambiguous). */
  def parseAnchors(json: String): Map[String, Double] =
    json.trim.stripPrefix("{").stripSuffix("}").split(",")
      .iterator.map(_.trim).filter(_.nonEmpty)
      .map { kv =>
        val Array(k, v) = kv.split(":", 2)
        k.trim.stripPrefix("\"").stripSuffix("\"") -> v.trim.toDouble
      }.toMap

  def loadAnchors(path: String): Option[Map[String, Double]] = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p))
      Some(parseAnchors(java.nio.file.Files.readString(p)))
    else None
  }

  /** Render one stderr block for Bench (stdout stays the driver's single
    * JSON line). */
  def render(r: Report): String = {
    val fam =
      if (r.familyDrift.isEmpty) ""
      else r.familyDrift.toSeq.sorted.map { case (f, d) => f"$f=$d%.2f" }
        .mkString(" families[", " ", "]")
    val head = f"[bench-guard] drift=${r.driftFactor}%.2f compared=${r.comparedCount} " +
      s"flagged=${r.flagged.length} missing=${r.missing.length}" + fam
    val flags = r.flagged.map { case (q, a, c, ratio) =>
      f"[bench-guard] REGRESSION $q: anchor $a%.2fs now $c%.2fs (${ratio}%.1fx over drifted anchor)"
    }
    val miss = r.missing.map(q => s"[bench-guard] MISSING $q: anchored but absent/failed")
    (head +: (flags ++ miss)).mkString("\n")
  }
}
