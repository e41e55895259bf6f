package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/**
 * SQL registrations for the compiled kernels, so the whole LLM-pipeline
 * surface is reachable from `spark.sql(...)` — not just the Scala API
 * (the reference registers no UDFs, SURVEY §2c; these are additions).
 */
object GraftFunctions {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects a literal INT argument, got $other")
  }

  private def reg(name: String, cls: Class[_])(
      builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(cls.getName, name), builder)

  /** (identifier, info, builder) triples for FunctionRegistry. */
  val registrations: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    reg("shingle_hashes", classOf[ShingleHashes]) { args =>
      require(args.length == 1 || args.length == 2,
        "shingle_hashes(text[, k]) expects 1 or 2 arguments")
      ShingleHashes(args.head,
        if (args.length == 2) intArg(args(1), "shingle_hashes") else 3)
    },
    reg("minhash_signature", classOf[MinHashSignature]) { args =>
      require(args.length == 1 || args.length == 2,
        "minhash_signature(hashes[, n]) expects 1 or 2 arguments")
      MinHashSignature(args.head,
        if (args.length == 2) intArg(args(1), "minhash_signature") else 64)
    },
    reg("simhash64", classOf[SimHash64]) { args =>
      require(args.length == 1, "simhash64(hashes) expects 1 argument")
      SimHash64(args.head)
    },
    reg("srp_bucket", classOf[SrpBucket]) { args =>
      require(args.length == 3,
        "srp_bucket(vec, planes, dim) expects 3 arguments")
      SrpBucket(args.head, intArg(args(1), "srp_bucket"),
        intArg(args(2), "srp_bucket"))
    },
    reg("text_profile", classOf[TextProfile]) { args =>
      require(args.length == 1, "text_profile(text) expects 1 argument")
      TextProfile(args.head)
    },
    reg("quantized_dot", classOf[QuantizedDot]) { args =>
      require(args.length == 2 || args.length == 3,
        "quantized_dot(a, b[, scale]) expects 2 or 3 arguments")
      QuantizedDot(coerceFloatArray(args.head), coerceFloatArray(args(1)),
        if (args.length == 3) intArg(args(2), "quantized_dot") else 10000)
    },
    // AggregateFunction builders are legal: the analyzer wraps the
    // returned aggregate into an AggregateExpression on resolution
    reg("quantized_vec_sum", classOf[QuantizedVecSum]) { args =>
      require(args.length == 1 || args.length == 2,
        "quantized_vec_sum(vec[, scale]) expects 1 or 2 arguments")
      QuantizedVecSum(coerceFloatArray(args.head),
        if (args.length == 2) intArg(args(1), "quantized_vec_sum") else 10000)
    })

  /** SQL array literals are array<double>; cast numeric element types to
    * array<float> (same builder-side coercion as cosine_similarity). */
  private def coerceFloatArray(e: Expression): Expression = {
    import org.apache.spark.sql.types.{ArrayType, FloatType, NumericType}
    e.dataType match {
      case ArrayType(FloatType, _) => e
      case ArrayType(_: NumericType, n) =>
        org.apache.spark.sql.catalyst.expressions.Cast(e, ArrayType(FloatType, n))
      case _ => e
    }
  }
}
