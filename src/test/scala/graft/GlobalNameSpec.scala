package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite
import scala.jdk.CollectionConverters._

/** Static guard for Verify's parallel-dump safety argument (round 9,
  * ADVICE r8 #1): the 8-wide dump pool is safe only while every
  * session-GLOBAL name — fixed-literal temp views and fixed-name managed
  * tables — is registered by exactly ONE catalog query. Nothing in Spark
  * enforces that; two queries reusing a name would race silently (one
  * query's createOrReplaceTempView swapping the view under the other's
  * running job). This spec scans the main sources and fails when a fixed
  * global name gains a second registration site or a NEW fixed name
  * appears outside the ownership map below — forcing the author to
  * either epoch-tag the name or extend the map consciously. */
class GlobalNameSpec extends AnyFunSuite {

  // fixed global name -> the ONE source file allowed to register it
  // (ownership by catalog query: sql_surface owns v_*, gold_star_schema
  // owns silver_* + the gold_* CTAS family via ops/Funnel)
  private val owners = Map(
    "silver_events" -> "ops/Funnel.scala",
    "silver_customers" -> "ops/Funnel.scala",
    "v_orders" -> "Queries.scala",
    "v_customer" -> "Queries.scala")

  private def mainSources: Seq[(String, String)] = {
    val root = Paths.get("src/main/scala")
    val s = Files.walk(root)
    try s.iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .map(p => root.relativize(p).toString.replace('\\', '/') ->
        new String(Files.readAllBytes(p), "UTF-8"))
      .toVector
    finally s.close()
  }

  test("every fixed-literal temp view is registered in exactly one " +
    "source file, and that file is its documented owner") {
    val reg = """createOrReplace(?:Global)?TempView\("([^"$]+)"\)""".r
    val sites = for {
      (file, text) <- mainSources
      m <- reg.findAllMatchIn(text)
    } yield m.group(1) -> file
    val byName = sites.groupBy(_._1)
    byName.foreach { case (name, ss) =>
      val files = ss.map(_._2).distinct
      assert(files.size == 1,
        s"temp view '$name' is registered in ${files.size} files ($files) " +
          "— a second registrant races the owner under Verify's dump pool; " +
          "epoch-tag the name or give the query its own view")
      assert(owners.get(name).exists(o => files.head.endsWith(o)),
        s"temp view '$name' in ${files.head} is not in GlobalNameSpec's " +
          "ownership map — add it consciously (it is a session-global " +
          "name every parallel-dumped query can see)")
    }
    // the documented owners actually exist (the map cannot go stale)
    owners.keys.foreach(n =>
      assert(byName.contains(n), s"documented global name '$n' no longer " +
        "registered anywhere — prune the ownership map"))
  }

  test("every fixed-literal managed-table name (CREATE TABLE/saveAsTable " +
    "with a constant name) is created in exactly one source file") {
    // fixed literals only: interpolated names (s"...$tag") are epoch- or
    // key-scoped by construction and excluded by the no-$ character class
    // \b not a literal space (ADVICE r9 #3): `name(` / name-at-newline
    // CTAS forms must not escape the single-owner guard
    val create = """CREATE TABLE (?:IF NOT EXISTS )?([A-Za-z_][A-Za-z0-9_]*)\b""".r
    val save = """saveAsTable\("([^"$]+)"\)""".r
    val sites = for {
      (file, text) <- mainSources
      m <- create.findAllMatchIn(text) ++ save.findAllMatchIn(text)
      // the gold script's {p}_-prefixed CTAS names are parameterized per
      // call; the literal-regex only sees unparameterized names
      name = m.group(1) if !name.startsWith("{")
    } yield name -> file
    sites.groupBy(_._1).foreach { case (name, ss) =>
      val files = ss.map(_._2).distinct
      assert(files.size == 1,
        s"managed table '$name' is created in ${files.size} files " +
          s"($files) — concurrent dumped queries would drop/recreate one " +
          "catalog table; tag the name per query or per epoch")
    }
  }
}
