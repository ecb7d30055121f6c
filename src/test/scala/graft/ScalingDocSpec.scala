package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Drift guard for measurement claims: any source comment of the form
  * `SCALING.md ("Section name")` is a promise that SCALING.md contains a
  * heading with that name. Round 6 shipped three comments pointing at
  * sections that were never written — this spec makes that class of doc
  * drift a test failure, the same way PlansDocSpec guards PLANS.md.
  *
  * Convention: cite numbers as `recorded in SCALING.md ("<heading
  * fragment>")` — the fragment must appear in some `#`-prefixed heading.
  * A bare `recorded in SCALING.md` with no quoted section also fails:
  * unanchored claims are how the drift crept in.
  */
class ScalingDocSpec extends AnyFunSuite {

  private val marker = """SCALING\.md \("([^"]+)"\)""".r
  private val bare = """recorded in SCALING\.md(?! \(")""".r

  private def scalaSources: Seq[Path] =
    (Files.walk(Paths.get("src")).iterator.asScala
      ++ Files.walk(Paths.get("tools")).iterator.asScala)
      .filter(p => p.toString.endsWith(".scala"))
      .filterNot(_.toString.endsWith("ScalingDocSpec.scala")) // the definition site
      .toSeq

  private lazy val headings: Seq[String] =
    Files.readAllLines(Paths.get("SCALING.md")).asScala.toSeq
      .filter(_.startsWith("#"))
      .map(_.dropWhile(c => c == '#' || c == ' '))

  test("every quoted SCALING.md marker in source names an existing heading") {
    val claims = scalaSources.flatMap { p =>
      val text = new String(Files.readAllBytes(p), "UTF-8")
      marker.findAllMatchIn(text).map(m => (p.toString, m.group(1))).toSeq
    }
    assert(claims.nonEmpty, "marker scan found nothing — regex or layout drifted")
    val broken = claims.filterNot { case (_, section) =>
      headings.exists(_.contains(section))
    }
    assert(broken.isEmpty,
      s"source cites SCALING.md sections that do not exist: ${broken.mkString(", ")}\n" +
        s"headings present: ${headings.mkString(" | ")}")
  }

  test("no unanchored 'recorded in SCALING.md' claims") {
    val loose = scalaSources.flatMap { p =>
      val text = new String(Files.readAllBytes(p), "UTF-8")
      bare.findAllMatchIn(text).map(_ => p.toString).toSeq
    }
    assert(loose.isEmpty,
      s"""unanchored claims (add ("<heading fragment>")): ${loose.mkString(", ")}""")
  }
}
