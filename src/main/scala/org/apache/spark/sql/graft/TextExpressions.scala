package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Recursive character splitter as a native Catalyst expression
  * (reference: splite_text/lang_chain_splitter.py:6-34 — separator
  * hierarchy, greedy merge, keep_separator=False).
  *
  * The algorithm is inherently imperative per-row string logic, so this
  * is a CodegenFallback expression rather than generated code — but
  * unlike a Scala UDF it needs no encoder round-trip, declares its
  * null/type contract to Catalyst, and stays usable from SQL via
  * [[graft.GraftExtensions]]. Chunking is a narrow transform: no
  * shuffle, scales linearly with input partitions.
  */
case class RecursiveSplit(child: Expression, size: Int, overlap: Int,
    separators: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "recursive_split"

  override protected def nullSafeEval(input: Any): Any = {
    val pieces = RecursiveSplit.split(
      input.asInstanceOf[UTF8String].toString, size, overlap, separators)
    new GenericArrayData(pieces.map(UTF8String.fromString).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RecursiveSplit {

  /** Separator hierarchy from lang_chain_splitter.py:17. */
  val defaultSeparators: Seq[String] =
    Seq("<row>", "</row>", "<Cell>", "</Cell>", "\n", "。", "，", "；", "！", "？", " ")

  /** Split on the first separator present, greedily merge pieces up to
    * `size` re-joined with that separator, recurse into oversize pieces
    * with the remaining separators; hard-wrap with `overlap` characters
    * of carried context when no separator applies. */
  def split(text: String, size: Int, overlap: Int,
      separators: Seq[String] = defaultSeparators): Seq[String] = {
    def splitOn(t: String, seps: Seq[String]): Seq[String] = {
      if (t.length <= size) return if (t.isEmpty) Nil else Seq(t)
      val sepIdx = seps.indexWhere(s => t.contains(s))
      if (sepIdx < 0) {
        // no separator applies: hard-wrap with overlap
        val stride = size - overlap
        (0 until t.length by stride).map(i => t.substring(i, math.min(i + size, t.length)))
      } else {
        val sep = seps(sepIdx)
        val rest = seps.drop(sepIdx + 1)
        val pieces = t.split(java.util.regex.Pattern.quote(sep)).toSeq.filter(_.nonEmpty)
        // greedy merge, recursing into pieces that alone exceed size
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var cur = new StringBuilder
        def flush(): Unit = if (cur.nonEmpty) { out += cur.toString; cur = new StringBuilder }
        pieces.foreach { p =>
          if (p.length > size) { flush(); out ++= splitOn(p, rest) }
          else if (cur.isEmpty) cur ++= p
          else if (cur.length + sep.length + p.length <= size) { cur ++= sep; cur ++= p }
          else { flush(); cur ++= p }
        }
        flush()
        out.toSeq
      }
    }
    splitOn(text, separators)
  }

  def column(text: Column, size: Int, overlap: Int,
      separators: Seq[String] = defaultSeparators): Column =
    ExpressionUtils.column(
      RecursiveSplit(ExpressionUtils.expression(text), size, overlap, separators))
}
