package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft.GraftBridge
import org.apache.spark.sql.types.IntegerType

import graft.functions.HashExpressions._

/** SQL surface for the engine's codegen'd kernels (SURVEY.md §2.11):
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions …
  *   SELECT minhash_sig(shingle_hash_set(text, 5), 32) FROM corpus
  *
  * makes every dedup/similarity primitive available to pure-SQL users —
  * the same `Expression` instances the Column API builds, so plans and
  * codegen are identical either way. For an already-running session (no
  * extensions conf), `GraftExtensions.register(spark)` injects the same
  * functions into that session's registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        GraftExtensions.info(name), builder))
    }
}

object GraftExtensions {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(i: Int, IntegerType) => i
    case other => throw new IllegalArgumentException(
      s"$fn expects an integer literal argument, got: $other")
  }

  private def arity(fn: String, args: Seq[Expression], n: Int): Unit =
    require(args.size == n, s"$fn expects $n argument(s), got ${args.size}")

  /** name → builder for every exposed kernel. */
  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "rolling_hash" -> { args =>
      arity("rolling_hash", args, 1); RollingHash(args.head)
    },
    "rolling_hash_array" -> { args =>
      arity("rolling_hash_array", args, 1); RollingHashArray(args.head)
    },
    "shingle_hash_set" -> { args =>
      arity("shingle_hash_set", args, 2)
      ShingleHashSet(args.head, intLit(args(1), "shingle_hash_set"))
    },
    "token_hashes" -> { args =>
      arity("token_hashes", args, 3)
      TokenHashes(args.head, intLit(args(1), "token_hashes"),
        intLit(args(2), "token_hashes"))
    },
    "window_hash_set" -> { args =>
      arity("window_hash_set", args, 2)
      WindowHashSet(args.head, intLit(args(1), "window_hash_set"))
    },
    "minhash_sig" -> { args =>
      arity("minhash_sig", args, 2)
      MinhashSig(args.head, intLit(args(1), "minhash_sig"))
    },
    "simhash32" -> { args =>
      arity("simhash32", args, 1); Simhash32(args.head)
    },
    "simhash_bits" -> { args =>
      arity("simhash_bits", args, 2)
      SimhashBits(args.head, intLit(args(1), "simhash_bits"))
    },
    "lsh_bands" -> { args =>
      arity("lsh_bands", args, 3)
      LshBands(args.head, intLit(args(1), "lsh_bands"), intLit(args(2), "lsh_bands"))
    },
    "plane_bands" -> { args =>
      arity("plane_bands", args, 3)
      PlaneBands(args.head, intLit(args(1), "plane_bands"),
        intLit(args(2), "plane_bands"))
    },
    "unit_vector" -> { args =>
      arity("unit_vector", args, 1); UnitVector(args.head)
    },
    "dot_product" -> { args =>
      arity("dot_product", args, 2); DotProduct(args.head, args(1))
    },
    "jaccard_long" -> { args =>
      arity("jaccard_long", args, 2); JaccardLong(args.head, args(1))
    },
    "graft_tokens" -> { args =>
      arity("graft_tokens", args, 3)
      graft.functions.TextExpressions.TokensOf(args.head,
        intLit(args(1), "graft_tokens"), intLit(args(2), "graft_tokens"))
    },
    "quality_score" -> { args =>
      arity("quality_score", args, 1)
      graft.functions.TextExpressions.QualityScore(args.head)
    },
    "bpeish_count" -> { args =>
      arity("bpeish_count", args, 1)
      graft.functions.TextExpressions.BpeishCount(args.head)
    })
  // NOTE: Column-DSL COMPOSITIONS (cleanText/normalized) are still not
  // registrable this way — their trees come back as unresolved
  // ColumnNodeExpressions that a FunctionBuilder's output never re-enters
  // analysis to resolve; SQL users spell those with the same built-ins.
  // tokens/quality/bpeish joined the registry once they became real
  // Expressions (TextExpressions).

  /** Inject the function set into an existing session's registry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (name, builder) =>
      GraftBridge.registerFunction(spark, name, info(name), builder)
    }
}
