package org.apache.spark.sql.graftvec

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** All per-document repetition counts (the Gopher-rule inputs) in ONE pass
  * over the text: word total/distinct, word-bigram total/distinct, and the
  * best `count × char-length` mass over bigrams.
  *
  * Why this exists: the column-program formulation (`split` → bigram
  * `transform` → `array_sort` + two `array_distinct` + an `aggregate` fold)
  * is semantically right and zero-shuffle, but allocates FIVE array copies
  * per document and pays an O(n log n) string sort just to count adjacent
  * runs — higher-order functions also evaluate their lambdas interpreted.
  * On a 100 TB corpus this per-row constant is the entire cost of the
  * operator. One hash-counting pass does the same counting in O(n) with a
  * single tokenization, inside whole-stage codegen (the generated code makes
  * one call into [[compute]] per row, so generated-method size is O(1)).
  *
  * Semantics are EXACTLY the column program's (oracle hashes unchanged):
  *  - words = `split(text, ' ')` with trailing empties kept (Java
  *    `split(regex, -1)` semantics, which Spark's `split` uses);
  *  - bigrams = `words(i) + " " + words(i+1)` for i in 0..n_words-2;
  *  - distinctness is full string equality (hash map on the strings — no
  *    hash-collision approximation);
  *  - `best_mass` = max over DISTINCT bigrams of occurrence-count ×
  *    `length(gram)` where length counts code points (Catalyst `length`
  *    counts characters, not UTF-16 units — emoji-safe);
  *  - NULL text → NULL struct (the column program nulls every metric).
  *
  * The fraction arithmetic (divisions + `round(_, 6)`) deliberately stays in
  * declarative Catalyst columns downstream: this expression only counts, so
  * rounding/division semantics cannot drift from the previous formulation.
  */
case class RepetitionCounts(child: Expression)
  extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)

  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_words_distinct", IntegerType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_bigrams_distinct", LongType, nullable = false),
    StructField("best_mass", LongType, nullable = false)))

  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_repetition_counts"

  /** The one-pass counting kernel; public so the generated code can call it
    * through the reference object (one virtual call per row — negligible
    * against the per-document tokenization it replaces).
    */
  def compute(v: UTF8String): InternalRow = {
    val s = v.toString
    val len = s.length
    // split on ' ' keeping ALL empty tokens (split-with-limit=-1 semantics):
    // n_words = separator count + 1, words collected as substrings
    var nW = 1
    var i = 0
    while (i < len) { if (s.charAt(i) == ' ') nW += 1; i += 1 }
    val words = new Array[String](nW)
    var start = 0
    var w = 0
    i = 0
    while (i < len) {
      if (s.charAt(i) == ' ') { words(w) = s.substring(start, i); w += 1; start = i + 1 }
      i += 1
    }
    words(w) = s.substring(start, len)
    val distinctW = new java.util.HashSet[String](math.max(16, nW * 2))
    var j = 0
    while (j < nW) { distinctW.add(words(j)); j += 1 }
    val nB = if (nW >= 2) nW - 1 else 0
    var best = 0L
    var nBd = 0L
    if (nB > 0) {
      val counts = new java.util.HashMap[String, Array[Long]](math.max(16, nB * 2))
      j = 0
      while (j < nB) {
        val g = words(j) + " " + words(j + 1)
        val c = counts.get(g)
        if (c == null) counts.put(g, Array(1L)) else c(0) += 1
        j += 1
      }
      nBd = counts.size.toLong
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val g = e.getKey
        val mass = e.getValue()(0) * g.codePointCount(0, g.length)
        if (mass > best) best = mass
      }
    }
    new GenericInternalRow(
      Array[Any](nW, distinctW.size, nB.toLong, nBd, best))
  }

  override protected def nullSafeEval(v: Any): Any =
    compute(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("repCounts", this,
        classOf[RepetitionCounts].getName)
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) " +
        s"$ref.compute($v);"
    })

  override protected def withNewChildInternal(newChild: Expression): RepetitionCounts =
    copy(child = newChild)
}
