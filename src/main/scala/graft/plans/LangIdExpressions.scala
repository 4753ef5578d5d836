package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared inner loop of [[TrigramLangScore]] — one compiled method used by
  * both the interpreted and generated paths (the [[FeatureHash]]
  * discipline).
  *
  * Language identification by character-trigram profile matching is the
  * published shape (Cavnar & Trenkle 1994 n-gram text categorization;
  * CCNet's first gate, Wenzek et al. 2020, is a fastText model over
  * exactly these character n-gram features). The model here is CLOSED
  * FORM: a literal (lang, trigram) → integer log-odds table, so scoring
  * is a pure function of the text — deterministic, engine-portable, and
  * mirrored exactly by a DuckDB VALUES join.
  *
  * Semantics (the contract the SQL oracle mirrors): tokenize on single
  * spaces; pad each token as `^token$`; every length-3 window of the
  * padded token is a gram (so a token of n bytes yields n grams, n ≥ 1);
  * score(lang) = Σ over gram occurrences of weight(lang, gram), missing
  * grams contribute 0. Grams are matched on BYTES (keys are packed
  * 24-bit byte triples); the profile is ASCII by construction, where
  * byte and character windows coincide — the oracle's character
  * `substring` agrees on every input the profile can match.
  */
object TrigramLang {

  /** Open-addressed int→row lookup sized for a ~hundred-entry profile:
    * keys are `(b0<<16)|(b1<<8)|b2` packed gram bytes, rows index a dense
    * weight matrix (nLangs longs per gram). Built once per expression
    * instance (driver) and shipped as a codegen reference object — the
    * per-gram probe is one mask + a short linear scan, no boxing.
    */
  final class Profile(entries: Array[(Int, Array[Long])], val nLangs: Int)
      extends Serializable {
    private val cap: Int = {
      var c = 8
      while (c < entries.length * 4) c = c << 1
      c
    }
    private val keys = Array.fill[Int](cap)(-1)
    private val rows = new Array[Array[Long]](cap)
    entries.foreach { case (k, w) =>
      var i = k & (cap - 1)
      while (keys(i) >= 0 && keys(i) != k) i = (i + 1) & (cap - 1)
      keys(i) = k
      rows(i) = w
    }

    def lookup(k: Int): Array[Long] = {
      var i = k & (cap - 1)
      while (keys(i) >= 0) {
        if (keys(i) == k) return rows(i)
        i = (i + 1) & (cap - 1)
      }
      null
    }
  }

  private final val Caret = '^'.toByte
  private final val Dollar = '$'.toByte
  private final val Space = ' '.toByte

  /** All-langs trigram scores of one document in ONE byte pass:
    * array(nLangs) of Σ matched weights, token loop fused with the gram
    * loop (no split allocation, no per-gram string).
    */
  def score(text: UTF8String, p: Profile): ArrayData = {
    val acc = new Array[Long](p.nLangs)
    val bytes = text.getBytes
    var s = 0
    val n = bytes.length
    while (s <= n) {
      var e = s
      while (e < n && bytes(e) != Space) e += 1
      // token bytes are [s, e); the padded form `^tok$` has L = e-s gram
      // windows — window j covers padded positions j, j+1, j+2, where
      // position 0 is '^', L+1 is '$', and p in [1, L] is bytes(s+p-1)
      val L = e - s
      var j = 0
      while (j < L) {
        val b0 = if (j == 0) Caret else bytes(s + j - 1)
        val b1 = bytes(s + j)
        val b2 = if (j == L - 1) Dollar else bytes(s + j + 1)
        val key = ((b0 & 0xff) << 16) | ((b1 & 0xff) << 8) | (b2 & 0xff)
        val w = p.lookup(key)
        if (w != null) {
          var l = 0
          while (l < acc.length) { acc(l) += w(l); l += 1 }
        }
        j += 1
      }
      s = e + 1
    }
    new GenericArrayData(acc)
  }
}

/** `lang_trigram_score(text)` → array<long> of per-language trigram
  * log-odds sums, language order = the `langs` constructor order. The
  * whole lang-id pass is this one map-side expression plus an argmax
  * CASE — ZERO exchanges over the corpus, the shape a 100 TB first-gate
  * must have (CCNet runs lang-id before anything else precisely because
  * it's a scan-bound map).
  *
  * Measured against the equivalent HOF formulation (per-token
  * `transform(sequence)` windows + `try_element_at` map probes per
  * language — `graft.LangIdScale`, 200k × 60-token docs, checksums
  * asserted equal): fused 0.5–0.9 s vs HOF 9.4–9.7 s — ~20×. The HOF
  * form pays interpreted higher-order machinery, a substring allocation
  * per window, and 5 separate per-language passes; this is one byte scan
  * with an open-addressed int probe scoring all languages at once.
  */
case class TrigramLangScore(child: Expression, langs: Seq[String],
    entries: Seq[(String, String, Long)]) extends UnaryExpression {
  require(langs.nonEmpty, "need at least one language")
  require(entries.forall(e => e._2.length == 3 && e._2.forall(_ < 128)),
    "profile grams must be 3 ASCII chars")

  override def prettyName: String = "lang_trigram_score"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  @transient private lazy val profile: TrigramLang.Profile = {
    val li = langs.zipWithIndex.toMap
    val byGram = entries.groupBy(_._2).map { case (g, es) =>
      val key = ((g.charAt(0) & 0xff) << 16) | ((g.charAt(1) & 0xff) << 8) |
        (g.charAt(2) & 0xff)
      val w = new Array[Long](langs.length)
      es.foreach { case (l, _, wt) => w(li(l)) += wt }
      (key, w)
    }.toArray
    new TrigramLang.Profile(byGram, langs.length)
  }

  override def nullSafeEval(v: Any): Any =
    TrigramLang.score(v.asInstanceOf[UTF8String], profile)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val p = ctx.addReferenceObj("trigramProfile", profile,
      classOf[TrigramLang.Profile].getName)
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.TrigramLang.score($a, $p);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
