package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared kernels of the Unicode-normalization expressions — one compiled
  * method each, used by both the interpreted and generated paths.
  *
  * Contracts (what the DuckDB oracle mirrors):
  *  - [[nfc]]: Unicode NFC canonical composition (java.text.Normalizer,
  *    the JDK's conformant implementation ≡ utf8proc's `nfc_normalize`
  *    by the Unicode standard's normalization uniqueness);
  *  - [[foldAccents]]: NFD decomposition, then every MARK code point
  *    (categories Mn/Mc/Me — `\p{M}`, utf8proc's STRIPMARK set) dropped,
  *    leaving base letters: é→e, ñ→n, ü→u; non-mark specials (ligatures
  *    like ﬁ) pass through untouched, matching `strip_accents`.
  *
  * The ASCII fast path matters: normalization of a 100 TB corpus is a
  * scan-bound map pass and the overwhelming majority of bytes are
  * already-normal ASCII — those rows return the INPUT object with zero
  * allocation.
  */
object UnicodeKernels {
  private def isAscii(s: String): Boolean = {
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) >= 0x80) return false
      i += 1
    }
    true
  }

  def nfc(text: UTF8String): UTF8String = {
    val s = text.toString
    if (isAscii(s) || java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) text
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  def foldAccents(text: UTF8String): UTF8String = {
    val s = text.toString
    if (isAscii(s)) return text
    val nfd = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < nfd.length) {
      val cp = nfd.codePointAt(i)
      val t = Character.getType(cp)
      if (t != Character.NON_SPACING_MARK && t != Character.COMBINING_SPACING_MARK &&
        t != Character.ENCLOSING_MARK) sb.appendCodePoint(cp)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}

/** Unicode NFC canonical normalization (`text_nfc`) — the first pass of
  * every text pipeline that hashes, deduplicates, or tokenizes: the SAME
  * visible string can arrive precomposed (é) or decomposed (e + U+0301),
  * and every byte-keyed operator downstream (exact dedup digests, MinHash
  * shingles, BM25 terms, feature-hash embeddings) treats them as
  * different documents unless normalization runs first. Map-side codegen,
  * zero shuffle, ASCII rows untouched objects.
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {
  override def prettyName: String = "text_nfc"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    UnicodeKernels.nfc(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.UnicodeKernels.nfc($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Accent folding (`text_fold_accents`) — NFD + drop marks: the matching
  * key for search/dedup across diacritic variants (resume ≈ résumé), the
  * `strip_accents` of utf8proc/Lucene's ASCIIFolding lineage. Composes
  * after [[NfcNormalize]]; ligatures and non-mark specials pass through.
  */
case class AccentFold(child: Expression) extends UnaryExpression {
  override def prettyName: String = "text_fold_accents"
  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    UnicodeKernels.foldAccents(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.UnicodeKernels.foldAccents($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
