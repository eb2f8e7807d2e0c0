package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-row computation for [[SimHash64]], shared by interpreted eval and
  * codegen (the generated code calls [[compute]] — the loop is
  * data-dependent, so inlining it in Janino buys nothing; a single static
  * call keeps the projection inside whole-stage codegen).
  *
  * Bit convention matches the SQL oracle tower (PipelineQueries.dSimhashSql
  * generalized to 64 bits): word hash = first 8 bytes of md5(utf8(word))
  * big-endian; simhash bit b tests bit (63-b) of that value — i.e. hex
  * digit b/4 of the md5 string, nibble mask 8 >> (b%4), exactly the 16-bit
  * query's convention extended to 16 hex digits.
  */
object SimHash64Funcs {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def wordHash(w: UTF8String): Long = {
    val d = md5.get()
    d.reset()
    val digest = d.digest(w.getBytes)
    java.nio.ByteBuffer.wrap(digest, 0, 8).getLong // big-endian
  }

  /** words assumed pre-deduplicated (array_distinct upstream); null
    * elements are skipped. Empty input → 0L (no bit has a positive vote). */
  def compute(words: ArrayData): Long = {
    val cnt = new Array[Int](64)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) {
        val h = wordHash(words.getUTF8String(i))
        var b = 0
        while (b < 64) {
          if (((h >>> (63 - b)) & 1L) == 1L) cnt(b) += 1 else cnt(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var r = 0L
    var b = 0
    while (b < 64) {
      if (cnt(b) > 0) r |= (1L << b)
      b += 1
    }
    r
  }
}

/** 64-bit SimHash over an array<string> of (distinct) words — the scale
  * path for near-dup fingerprints: the 16-bit SQL-expression tower
  * (64 conditional sums per row after an explode+distinct shuffle) does not
  * stretch to 64 bits cheaply, while this is one codegen-resident call per
  * row with NO shuffle (dedup via array_distinct, not explode+distinct).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 needs array<string> input, got $other")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHash64Funcs.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // static forwarder call — no captured reference object, so nothing
    // non-serializable rides along with the task
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.SimHash64Funcs.compute($arr);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}
