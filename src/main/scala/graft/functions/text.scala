package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native text expressions for the dedup operators. */
object text {

  /** Word n-gram shingles → array&lt;string&gt;; docs shorter than `n`
    * tokens yield their whole (space-rejoined) text as the single shingle.
    *
    * Semantics are bit-equal to the declarative formulation
    * `transform(sequence(1, size(toks)-n+1), i -> concat_ws(" ",
    * slice(toks, i, n)))` with `toks = split(text, " ")` — but that plan
    * re-evaluates `split(text)` INSIDE the interpreted lambda, once per
    * shingle position (O(len²) per document, measured ~6.5 s of the 8.6 s
    * x6 runtime at sf0.1). This tokenizes once per row.
    */
  case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
    require(n >= 1, "shingle width must be >= 1")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullIntolerant: Boolean = true

    private val space = UTF8String.fromString(" ")

    /** Invoked from both eval and generated code. */
    def compute(s: UTF8String): GenericArrayData = {
      // same tokenization as split(text, " ") (regex split, limit -1)
      val toks = s.split(space, -1)
      val count = toks.length - (n - 1)
      if (count <= 0) {
        new GenericArrayData(Array[Any](UTF8String.concatWs(space, toks: _*)))
      } else {
        val out = new Array[Any](count)
        var i = 0
        while (i < count) {
          val win = new Array[UTF8String](n)
          System.arraycopy(toks, i, win, 0, n)
          out(i) = UTF8String.concatWs(space, win: _*)
          i += 1
        }
        new GenericArrayData(out)
      }
    }

    override def nullSafeEval(v: Any): Any = compute(v.asInstanceOf[UTF8String])
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShingles].getName)
      nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.compute($v);")
    }
    override protected def withNewChildInternal(c: Expression): WordShingles = copy(child = c)
  }

  def word_shingles(textCol: Column, n: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(textCol), n))
}
