package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two `array<float>` embedding
  * columns — the "custom Catalyst `Expression` beats UDF" extension path
  * for the one hot loop the built-in surface only reaches through
  * interpreted higher-order functions (`aggregate`/`zip_with` lambdas).
  *
  * Semantics are bit-identical to the declarative form used everywhere
  * else (and to the DuckDB oracle): float→double widening per element,
  * index-order accumulation of dot/normA/normB, then
  * `dot / (sqrt(normA) * sqrt(normB))` — each accumulator is an
  * independent left fold, so fusing the three loops does not change any
  * intermediate rounding.
  */
case class CosineSimilarityF32(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def dataType: DataType = DoubleType

  override def prettyName: String = "graft_cosine"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarityF32 =
    copy(left = newLeft, right = newRight)
}

/** Session-extension entry point (`spark.sql.extensions=graft.functions.
  * GraftExtensions` or `builder.withExtensions`): registers the native
  * functions into the Catalyst function registry so SQL and
  * `call_function` reach them.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => new graft.plans.TopKRewrite)
    ext.injectOptimizerRule(_ => new graft.plans.ApproxDistinctRewrite)
    // the whole-operator extension tier: custom logical node → custom
    // SparkPlan (SURVEY §2 custom-op preference (c))
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(classOf[CosineSimilarityF32].getName, "graft_cosine"),
      (children: Seq[Expression]) => CosineSimilarityF32(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_rolling_fp"),
      new ExpressionInfo(classOf[RollingFingerprintF].getName, "graft_rolling_fp"),
      (children: Seq[Expression]) => RollingFingerprintF(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_quality"),
      new ExpressionInfo(classOf[TextQualityF].getName, "graft_quality"),
      (children: Seq[Expression]) => TextQualityF(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_langid_marker"),
      new ExpressionInfo(classOf[LangIdMarkerF].getName, "graft_langid_marker"),
      (children: Seq[Expression]) => LangIdMarkerF(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_langid_ngram"),
      new ExpressionInfo(classOf[LangIdNgramF].getName, "graft_langid_ngram"),
      (children: Seq[Expression]) => LangIdNgramF(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_shingles"),
      new ExpressionInfo(classOf[ShinglesF].getName, "graft_shingles"),
      (children: Seq[Expression]) => ShinglesF(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[SimhashF].getName, "graft_simhash"),
      (children: Seq[Expression]) => SimhashF(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinhashF].getName, "graft_minhash"),
      (children: Seq[Expression]) => MinhashF(children(0), children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_fingerprint"),
      new ExpressionInfo(classOf[FingerprintF].getName, "graft_fingerprint"),
      (children: Seq[Expression]) => FingerprintF(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_topk"),
      new ExpressionInfo(classOf[TopKAgg].getName, "graft_topk"),
      (children: Seq[Expression]) => TopKAgg(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_heavyhitters"),
      new ExpressionInfo(classOf[MisraGriesAgg].getName, "graft_heavyhitters"),
      (children: Seq[Expression]) => MisraGriesAgg(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalizeF].getName, "graft_nfc"),
      (children: Seq[Expression]) => NfcNormalizeF(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_normalize"),
      new ExpressionInfo(classOf[NormalizeF].getName, "graft_normalize"),
      (children: Seq[Expression]) => NormalizeF(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_unit_normalize"),
      new ExpressionInfo(classOf[UnitNormalizeF32].getName, "graft_unit_normalize"),
      (children: Seq[Expression]) => UnitNormalizeF32(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProductF64].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProductF64(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_ewma"),
      new ExpressionInfo(classOf[EwmaHalfF64].getName, "graft_ewma"),
      (children: Seq[Expression]) => EwmaHalfF64(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_kmeans_assign"),
      new ExpressionInfo(classOf[KmeansAssignI64].getName, "graft_kmeans_assign"),
      (children: Seq[Expression]) => KmeansAssignI64(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_cooc_pairs"),
      new ExpressionInfo(classOf[CoocPairsF].getName, "graft_cooc_pairs"),
      (children: Seq[Expression]) => CoocPairsF(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_markup_counts"),
      new ExpressionInfo(classOf[MarkupCountsF].getName, "graft_markup_counts"),
      (children: Seq[Expression]) => MarkupCountsF(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_ngram_rep"),
      new ExpressionInfo(classOf[NgramRepProfileF].getName, "graft_ngram_rep"),
      (children: Seq[Expression]) => NgramRepProfileF(children(0), children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_marker_hits"),
      new ExpressionInfo(classOf[MarkerHitsAllF].getName, "graft_marker_hits"),
      (children: Seq[Expression]) => MarkerHitsAllF(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_script_mix"),
      new ExpressionInfo(classOf[ScriptMixF].getName, "graft_script_mix"),
      (children: Seq[Expression]) => ScriptMixF(children(0))))
    ext.injectFunction((
      FunctionIdentifier("graft_charlm"),
      new ExpressionInfo(classOf[CharLmF].getName, "graft_charlm"),
      (children: Seq[Expression]) => CharLmF(children(0), children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("graft_lsh_bands"),
      new ExpressionInfo(classOf[LshBandsF32].getName, "graft_lsh_bands"),
      (children: Seq[Expression]) => LshBandsF32(
        children(0), foldInt(children(1)), foldInt(children(2)), foldInt(children(3)))))
  }

  /** The LSH geometry arguments must be integer literals: folded once at
    * expression build so the plane matrix is a plan constant.
    */
  private def foldInt(e: Expression): Int = e.eval(null) match {
    case i: Int => i
    case other => throw new IllegalArgumentException(
      s"graft_lsh_bands expects foldable int literals, got $other")
  }
}
