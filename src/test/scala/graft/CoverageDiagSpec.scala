package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.synth._

/** Diagnostic: the sampled workload must actually exercise every
  * template (errors, warnings, fallbacks, dialects) — guards against a
  * vacuously green round-trip suite. */
class CoverageDiagSpec extends AnyFunSuite {
  test("workload mix covers all templates, dialects and outcome shapes") {
    var headerErr, codeErr, tableErr, cfgMiss, lowConf = 0
    var pdf, html, plain = 0
    var overflow, faint, dup, specks, extraPage, style1 = 0
    var withCode, noCode = 0
    val kinds = scala.collection.mutable.Map[String, Int]().withDefaultValue(0)
    val n = 3000
    for (i <- 0 until n) {
      val conv = f"conv-$i%06d"
      val spec = Synth.specFor(conv, 0)
      val gt = TurnGen.genTurn(conv, 0)
      val e = gt.expected
      kinds(spec.tableKind.toString) += 1
      spec.dialect match {
        case "pdf" => pdf += 1; case "html" => html += 1; case _ => plain += 1
      }
      if (spec.hatOverflow) overflow += 1
      if (spec.faintCells) faint += 1
      if (spec.dupCell) dup += 1
      if (spec.specks) specks += 1
      if (spec.extraPage) extraPage += 1
      if (spec.headerStyle == 1) style1 += 1
      if (e.errors.exists(_.contains(Messages.HeaderError))) headerErr += 1
      if (e.errors.exists(_.contains(Messages.CodeError))) codeErr += 1
      if (e.errors.exists(_.contains(Messages.TableError))) tableErr += 1
      if (e.warnings.exists(_.contains(Messages.ConfigMissWarning))) cfgMiss += 1
      if (e.warnings.exists(_.exists(_.startsWith(Messages.LowConfPrefix)))) lowConf += 1
      if (e.participant_code.isDefined) withCode += 1 else noCode += 1
    }
    info(s"dialects pdf=$pdf html=$html plain=$plain")
    info(s"kinds=${kinds.toSeq.sortBy(_._1)}")
    info(s"overflow=$overflow style1=$style1 faint=$faint dup=$dup specks=$specks extraPage=$extraPage")
    info(s"errors: header=$headerErr code=$codeErr table=$tableErr; warn: cfgMiss=$cfgMiss lowConf=$lowConf")
    info(s"code: some=$withCode none=$noCode")
    assert(pdf > 0 && html > 0 && plain > 0)
    assert(Seq(headerErr, codeErr, tableErr, cfgMiss, lowConf).forall(_ > 0))
    assert(Seq(overflow, style1, faint, dup, specks, extraPage).forall(_ > 0))
    assert(kinds.size >= 6)
    assert(withCode > 0 && noCode > 0)
  }
}
