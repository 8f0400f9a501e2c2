package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{CountInSet, DotProduct, Md5Hash48, NGramShingles, SimHash64, VecNorm}

/** SQL-surface registration of the engine's native Catalyst expressions, so
  * `spark.sql("SELECT vec_dot(a, b) ...")` works anywhere DataFrame code
  * does. Two entry points:
  *
  *   - `spark.sql.extensions=graft.GraftExtensions` at session build
  *     (standard extension-jar deployment on a cluster);
  *   - [[GraftFunctions.registerAll]] on an existing session (notebooks,
  *     tests).
  *
  * Registered functions (thin: each maps 1:1 onto an expression class):
  *   - `simhash64(array<bigint>)` — Charikar simhash of feature hashes
  *     (compose with the built-in `transform(x, s -> xxhash64(s))`)
  *   - `ngram_shingles(array<string>, n)` — distinct word n-gram shingles
  *   - `vec_dot(array<float|double>, array<float|double>)`
  *   - `vec_norm(array<float|double>)`
  *   - `count_in_set(array<string>, array('w1','w2',...))` — occurrences of
  *     set members (words must be a foldable literal array)
  *   - `md5_hash48(binary)` — first 48 md5 bits as BIGINT (the engine's
  *     cross-engine-reproducible hash basis)
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
}

object GraftFunctions {

  private def arity(name: String, n: Int)(args: Seq[Expression]): Seq[Expression] = {
    require(args.length == n, s"$name expects $n argument(s), got ${args.length}")
    args
  }

  private def intLit(name: String, e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name: n must be an integer literal, got $other")
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "simhash64" -> (args => SimHash64(arity("simhash64", 1)(args).head)),
    "ngram_shingles" -> { args =>
      val Seq(toks, n) = arity("ngram_shingles", 2)(args)
      NGramShingles(toks, intLit("ngram_shingles", n))
    },
    "vec_dot" -> { args =>
      val Seq(a, b) = arity("vec_dot", 2)(args)
      DotProduct(a, b)
    },
    "vec_norm" -> (args => VecNorm(arity("vec_norm", 1)(args).head)),
    "md5_hash48" -> (args => Md5Hash48(arity("md5_hash48", 1)(args).head)),
    "count_in_set" -> { args =>
      val Seq(toks, wordsExpr) = arity("count_in_set", 2)(args)
      require(wordsExpr.foldable, "count_in_set: words must be a literal array")
      val words = wordsExpr.eval() match {
        case a: org.apache.spark.sql.catalyst.util.ArrayData =>
          (0 until a.numElements()).map(i => a.getUTF8String(i).toString)
        case other => throw new IllegalArgumentException(
          s"count_in_set: expected array<string> literal, got $other")
      }
      CountInSet(toks, words)
    })

  /** Register every engine function as a temp function on `spark`. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    all.foreach { case (name, builder) =>
      org.apache.spark.sql.graft.FunctionBridge.registerTemp(spark, name, builder)
    }
}
