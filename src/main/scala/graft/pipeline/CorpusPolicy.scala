package graft.pipeline

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.json4s.{DefaultFormats, JArray, JObject, JValue}
import org.json4s.jackson.JsonMethods

/** Per-source overrides of the corpus gate/dedup policy; `None` = inherit
  * the default. Mirrors the reference's per-file sections of
  * sources_config.json (sources2csr reads per-file delimiter/date formats
  * the same way: one defaults block, per-source overrides). */
final case class SourcePolicy(
    minQuality: Option[Double] = None,
    minTokens: Option[Long] = None,
    dropLangs: Option[Seq[String]] = None,
    shingleSize: Option[Int] = None)

/** §8f(v) — config-driven corpus policy: the gate thresholds and near-dup
  * shingle sizes the training pipeline applies, with per-source overrides.
  *
  * The defaults reproduce the fixed gate the batch `docs_quality_filter`
  * and streaming ingest share ([[graft.streaming.DocStreams.scored]]), so
  * a pipeline with no config file behaves exactly as before.
  *
  * Scale shape: the policy is bounded config (one row per *source*, not
  * per document) — it reaches the data plane as a broadcast join, never a
  * shuffle. Shingle sizes partition sources into size groups; the near-dup
  * stage runs one banding pass per distinct size, so cost scales with the
  * number of distinct sizes (typically 1–2), not the number of sources. */
final case class CorpusPolicy(
    minQuality: Double = 0.5,
    minTokens: Long = 10L,
    dropLangs: Seq[String] = Seq("zh"),
    shingleSize: Int = 3,
    perSource: Map[String, SourcePolicy] = Map.empty) {

  /** Effective thresholds for one source. */
  def resolve(source: String): (Double, Long, Seq[String], Int) = {
    val o = perSource.getOrElse(source, SourcePolicy())
    (o.minQuality.getOrElse(minQuality), o.minTokens.getOrElse(minTokens),
      o.dropLangs.getOrElse(dropLangs), o.shingleSize.getOrElse(shingleSize))
  }

  /** Distinct effective shingle sizes → the explicitly-configured sources
    * using each. Sources not listed (and listed sources without a
    * shingle_size override) fall in the default-size group, represented by
    * the ABSENCE of their name: the caller matches "source not in any
    * other group" for the default size. */
  def shingleSizeGroups: Map[Int, Seq[String]] =
    perSource.toSeq
      .map { case (src, o) => (o.shingleSize.getOrElse(shingleSize), src) }
      .filter(_._1 != shingleSize)
      .groupBy(_._1).map { case (sz, xs) => sz -> xs.map(_._2).sorted }

  /** Canonical signature of the policy — part of the pipeline's task input
    * signal, so editing the config re-runs the affected cone exactly like
    * a data change (the reference treats sources_config.json the same
    * way: config is an input). */
  def signature: String = {
    val per = perSource.toSeq.sortBy(_._1).map { case (s, o) =>
      s"$s:${o.minQuality.getOrElse("")}:${o.minTokens.getOrElse("")}:" +
        s"${o.dropLangs.map(_.mkString("+")).getOrElse("")}:${o.shingleSize.getOrElse("")}"
    }
    (s"$minQuality:$minTokens:${dropLangs.mkString("+")}:$shingleSize" +: per).mkString("|")
  }
}

object CorpusPolicy {
  private implicit val formats: DefaultFormats.type = DefaultFormats

  /** Parse the JSON config:
    * {{{
    * { "default": {"min_quality": 0.5, "min_tokens": 10,
    *               "drop_langs": ["zh"], "shingle_size": 3},
    *   "sources": {"web":   {"min_quality": 0.6},
    *               "books": {"min_tokens": 50, "shingle_size": 4}} }
    * }}}
    * Both sections are optional; omitted keys inherit the defaults above.
    * Config is driver-side bounded metadata — parsed once, no Spark job. */
  def parse(json: String): CorpusPolicy = {
    val root = JsonMethods.parse(json)
    val base = CorpusPolicy()
    val d = root \ "default"
    val withDefaults = base.copy(
      minQuality = dbl(d \ "min_quality").getOrElse(base.minQuality),
      minTokens = lng(d \ "min_tokens").getOrElse(base.minTokens),
      dropLangs = strs(d \ "drop_langs").getOrElse(base.dropLangs),
      shingleSize = int(d \ "shingle_size").getOrElse(base.shingleSize))
    val sources = root \ "sources" match {
      case JObject(fields) => fields.map { case (name, v) =>
        name -> SourcePolicy(dbl(v \ "min_quality"), lng(v \ "min_tokens"),
          strs(v \ "drop_langs"), int(v \ "shingle_size"))
      }.toMap
      case _ => Map.empty[String, SourcePolicy]
    }
    withDefaults.copy(perSource = sources)
  }

  def load(path: String): CorpusPolicy =
    parse(new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8))

  private def dbl(v: JValue): Option[Double] = v.toOption.map(_.extract[Double])
  private def lng(v: JValue): Option[Long] = v.toOption.map(_.extract[Long])
  private def int(v: JValue): Option[Int] = v.toOption.map(_.extract[Int])
  private def strs(v: JValue): Option[Seq[String]] = v match {
    case JArray(xs) => Some(xs.map(_.extract[String]))
    case _ => None
  }
}
