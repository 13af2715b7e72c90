package org.apache.spark.sql.graft

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, BinaryType, DataType, LongType}

/** The md5 hex-slice hash space without the hex round trip.
  *
  * Every cross-engine hash in this repo is "an integer read off the
  * first hex characters of md5(...)" (HashFunctions): the SQL
  * formulation `conv(substring(md5(x), 1, n), 16, 10)` computes the
  * digest, hex-ENCODES it to a 32-char string, substrings, then
  * string-PARSES the slice back to a long — three string
  * allocations per value, and the dedup operators evaluate it once
  * per shingle (millions of times per corpus scan). [[Md5Prefix64]]
  * returns the digest's first 8 bytes as one big-endian long in a
  * tight codegen'd call; the hex-slice values are then pure bit
  * shifts of it (first 8 hex chars = top 32 bits, first 15 = top 60)
  * — bit-identical to the SQL form, same DuckDB oracle arithmetic.
  */
object HashExpressions {

  /** First 8 bytes of md5(input) as a big-endian long. */
  def md5Prefix64(c: Column): Column =
    ExpressionUtils.column(Md5Prefix64(ExpressionUtils.expression(c)))

  /** Thread-local digest: MessageDigest.getInstance per row is the
    * hidden cost of the commons-codec path Spark's own Md5 uses. */
  private val md = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** Digest `bytes` and read the first 8 bytes big-endian. Public
    * static face for the generated code. */
  def head64(bytes: Array[Byte]): Long = {
    val d = md.get()
    d.reset()
    val h = d.digest(bytes)
    ((h(0) & 0xffL) << 56) | ((h(1) & 0xffL) << 48) |
      ((h(2) & 0xffL) << 40) | ((h(3) & 0xffL) << 32) |
      ((h(4) & 0xffL) << 24) | ((h(5) & 0xffL) << 16) |
      ((h(6) & 0xffL) << 8) | (h(7) & 0xffL)
  }
}

case class Md5Prefix64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType)
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix64"

  override def nullSafeEval(input: Any): Any =
    HashExpressions.head64(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.graft.HashExpressions.head64($c)")

  override protected def withNewChildInternal(
      newChild: Expression): Md5Prefix64 = copy(child = newChild)
}
