package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions entry point: a session built with GraftExtensions has
  * every custom function available in pure SQL with NO register() calls
  * — including sessions cloned with newSession(), which per-session temp
  * functions do not survive. */
class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions injects all custom functions, surviving newSession()") {
    // reuse the shared SparkContext; force a NEW SparkSession so the
    // builder applies the extensions (getOrCreate would return the
    // existing extension-less session)
    val base = SparkSpec.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      try {
        def check(sql: String, expect: Any, session: SparkSession = s): Unit =
          assert(session.sql(sql).head().get(0) == expect, sql)
        check("SELECT float_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
          "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))", 11.0)
        check("SELECT int_dot(array(1, 2), array(3, 4))", 11L)
        check("SELECT size(text_shingles('a b c d', 3))", 2)
        check("SELECT size(minhash_sigs(array('x', 'y'), 9))", 9)
        check("SELECT size(simhash_fp(array('tok')))", 2)
        check("SELECT binary_to_struct(struct_to_binary(named_struct('a', 7)), 'a INT').a", 7)
        // the whole point of extensions over temp functions: clones keep them
        check("SELECT int_dot(array(2, 2), array(5, 5))", 20L, s.newSession())
        // misuse gets a readable argument error, not an internal trace
        def messageChain(t: Throwable): String = {
          var cur = t; val sb = new StringBuilder
          while (cur != null) { sb.append(cur.getMessage).append('|'); cur = cur.getCause }
          sb.toString
        }
        val arity = intercept[Throwable](s.sql("SELECT text_shingles('a b c')").collect())
        assert(messageChain(arity).contains("expects 2"), messageChain(arity))
        val notLit = intercept[Throwable](
          s.sql("SELECT minhash_sigs(array('x'), CAST(9 AS BIGINT))").collect())
        assert(messageChain(notLit).contains("literal INT"), messageChain(notLit))
      } finally {
        // the derived session shares the context; just clear the handles
        SparkSession.clearActiveSession()
        SparkSession.clearDefaultSession()
      }
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
