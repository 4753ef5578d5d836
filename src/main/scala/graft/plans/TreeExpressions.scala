package graft.plans

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Recursive nav-tree UDTF — the reference's `getChild` walk
  * (`Crawling.py:23-30`) as ONE Catalyst `Generator`: parse a nested
  * `{title, link, children:[...]}` payload and emit every descendant as a
  * (title, url, depth) row in a single pass, child urls accumulating the
  * parent's (`baseUrl + n["link"]`, `Crawling.py:26`). Replaces the
  * per-level explode/frontier-join formulations for ARBITRARY depth: one
  * Generate over the payload rows instead of depth-many distributed
  * passes — the §2.J "Generator (UDTF)" deep form. Accepts either a
  * `{list:[...]}` wrapper (the reference's payload shape,
  * `Crawling.py:19`) or a bare node. Preorder, depth starts at 1.
  */
case class NavTreeExplode(child: Expression)
  extends UnaryExpression with Generator with CodegenFallback {

  override def prettyName: String = "nav_tree_explode"

  override def elementSchema: StructType = StructType(Seq(
    StructField("title", StringType, nullable = true),
    StructField("url", StringType, nullable = false),
    StructField("depth", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a json string, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val json = child.eval(input)
    if (json == null) Iterator.empty
    else {
      val out = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
      def walk(node: JsonNode, parentUrl: String, depth: Long): Unit = {
        val link = Option(node.get("link")).map(_.asText).getOrElse("")
        val url = parentUrl + link
        val title = Option(node.get("title")).map(_.asText)
        out += InternalRow(
          title.map(UTF8String.fromString).orNull,
          UTF8String.fromString(url), depth)
        val kids = node.get("children")
        if (kids != null && kids.isArray) {
          var i = 0
          while (i < kids.size()) { walk(kids.get(i), url, depth + 1); i += 1 }
        }
      }
      // malformed payloads emit nothing — the same row-local failure
      // semantics as from_json (null struct → no exploded rows), so one
      // bad page cannot abort a corpus-wide flatten
      val root =
        try NavTreeExplode.Mapper.readTree(json.toString)
        catch { case _: com.fasterxml.jackson.core.JacksonException => null }
      if (root == null) return Iterator.empty
      val list = root.get("list")
      if (list != null && list.isArray) {
        var i = 0
        while (i < list.size()) { walk(list.get(i), "", 1L); i += 1 }
      } else walk(root, "", 1L)
      out
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NavTreeExplode {
  /** readTree is thread-safe on a shared mapper (configuration is not
    * mutated after construction).
    */
  private val Mapper = new ObjectMapper()
}
