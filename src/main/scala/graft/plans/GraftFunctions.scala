package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.TextAnalysis

/** SQL registration of the graft native expressions, so `spark.sql` users
  * get the same operators as the Column API:
  *
  *   SELECT graft_cosine(a.embedding, b.embedding) FROM ...
  *   SELECT graft_simhash(graft_md5_60(split(lower(text), '\\s+'))) ...
  *
  * Two entry points: [[GraftFunctions.register]] for an existing session,
  * and [[GraftExtensions]] for `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
object GraftFunctions {

  private def intArg(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name expects a literal int, got $other")
  }

  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> { args =>
      require(args.length == 2, "graft_cosine(a, b)")
      CosineSimilarityExpr(args(0), args(1))
    },
    "graft_shingles" -> { args =>
      require(args.length == 2, "graft_shingles(tokens, n)")
      TextHashExprs.ShinglesExpr(args(0), intArg(args(1), "graft_shingles"))
    },
    "graft_md5_60" -> { args =>
      require(args.length == 1, "graft_md5_60(arr)")
      TextHashExprs.Md5Prefix60ArrayExpr(args(0))
    },
    "graft_minhash_sig" -> { args =>
      require(args.length == 2, "graft_minhash_sig(hashes, k)")
      TextHashExprs.MinHashSigExpr(args(0), intArg(args(1), "graft_minhash_sig"))
    },
    "graft_simhash" -> { args =>
      require(args.length == 2, "graft_simhash(hashes, bits)")
      TextHashExprs.SimHashExpr(args(0), intArg(args(1), "graft_simhash"))
    },
    "graft_lang_id" -> { args =>
      require(args.length == 1, "graft_lang_id(tokens)")
      TextHashExprs.LangIdExpr(args(0),
        Seq("en", "es", "de", "fr", "zh"), TextAnalysis.Stopwords)
    },
    "graft_lsh_buckets" -> { args =>
      require(args.length == 3, "graft_lsh_buckets(vec, bitsPerTable, nTables)")
      HyperplaneBucketsExpr(args(0),
        intArg(args(1), "graft_lsh_buckets"),
        intArg(args(2), "graft_lsh_buckets"))
    },
    "graft_kmv_distinct" -> { args =>
      require(args.length == 2, "graft_kmv_distinct(hash60, k)")
      graft.operators.KmvSketch.KmvDistinctAgg(args(0),
        intArg(args(1), "graft_kmv_distinct")).toAggregateExpression()
    })

  /** Register into a live session's function registry. */
  def register(spark: SparkSession): Unit = all.foreach { case (name, b) =>
    org.apache.spark.sql.graftbridge.Bridge.registerFunction(spark, name, b)
  }
}

/** `spark.sql.extensions` entry point: the graft SQL functions plus
  * the DML router ([[GraftDmlRule]] — `DELETE FROM`/`UPDATE`/`MERGE
  * INTO` on manifest tables).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.all.foreach { case (name, b) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft.plans.TextHashExprs", name), b))
    }
    ext.injectResolutionRule(session => new GraftDmlRule(session))
    // dv'd-table scans back to vectorized batches: stock parquet
    // format + a row_index tombstone filter (Delta's shape)
    ext.injectResolutionRule(session =>
      new graft.sources.GraftDvScanRule(session))
    // hint batch = BEFORE relation resolution, where Spark's
    // V2SessionCatalog would throw on V1 time travel
    ext.injectHintResolutionRule(session =>
      new GraftTimeTravelRule(session))
    // maintenance verbs Spark's grammar lacks (OPTIMIZE / VACUUM /
    // DESCRIBE HISTORY / RESTORE / REORG) — wraps, never replaces
    ext.injectParser((session, delegate) =>
      new GraftSqlParser(session, delegate))
    // table-valued CDC reads: FROM graft_changes('t', 0[, 5])
    ext.injectTableFunction((FunctionIdentifier("graft_changes"),
      new ExpressionInfo("graft.plans.GraftDml", "graft_changes"),
      GraftDml.changesTvf))
    ext.injectTableFunction((FunctionIdentifier("graft_appends"),
      new ExpressionInfo("graft.plans.GraftDml", "graft_appends"),
      GraftDml.appendsTvf))
  }
}
