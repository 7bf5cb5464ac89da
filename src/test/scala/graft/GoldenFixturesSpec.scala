package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.core._
import graft.synth._
import graft.synth.Synth._

/** The five reference golden fixtures (tests/test_data/&lt;name&gt;/response.json)
  * ported verbatim: each is rendered as a synthetic turn whose payload
  * deterministically encodes the same logical title page, extracted,
  * and byte-compared through the canonical serializer against the
  * fixture values (SURVEY.md §5 item 1).
  */
class GoldenFixturesSpec extends AnyFunSuite {

  private def fx(cls: Int, p: Double) = CellSpec(cls, p)
  private val X = 11

  final case class Fixture(
      name: String, key: String, display: String, grade: String,
      code: Option[String], cells: Vector[CellSpec],
      expectedJson: String)

  // transcribed from /root/reference/tests/test_data/<name>/response.json
  val fixtures: Seq[Fixture] = Seq(
    Fixture("math6", "математика 6", "Математика", "6", Some("60001"),
      Vector(fx(X, .98), fx(1, 1), fx(1, 1), fx(1, 1), fx(1, 1), fx(1, 1), fx(1, 1),
        fx(X, .91), fx(2, 1), fx(1, 1), fx(2, 1), fx(1, .99), fx(2, 1)),
      """{"subject": "математика", "grade": "6", "variant": "1", "participant_code": "60001", "total_score": 14, "scores": {"1": ["x", 0.98], "2": [1, 1.0], "3": [1, 1.0], "4": [1, 1.0], "5": [1, 1.0], "6": [1, 1.0], "7": [1, 1.0], "8": ["x", 0.91], "9": [2, 1.0], "10": [1, 1.0], "11": [2, 1.0], "12": [1, 0.99], "13": [2, 1.0]}, "errors": null, "warnings": null}"""),
    Fixture("math7", "математика 7", "Математика", "7", None,
      Vector(fx(1, .99), fx(1, 1), fx(1, .95), fx(1, .96), fx(4, .76), fx(3, .99),
        fx(2, .86), fx(1, .99), fx(0, .95), fx(1, .79), fx(1, .93), fx(1, .95),
        fx(3, .95), fx(4, .66), fx(2, .92), fx(1, .99)),
      """{"subject": "математика", "grade": "7", "variant": "1", "participant_code": null, "total_score": 27, "scores": {"1": [1, 0.99], "2": [1, 1.0], "3": [1, 0.95], "4": [1, 0.96], "5": [4, 0.76], "6": [3, 0.99], "7": [2, 0.86], "8": [1, 0.99], "9": [0, 0.95], "10": [1, 0.79], "11": [1, 0.93], "12": [1, 0.95], "13": [3, 0.95], "14": [4, 0.66], "15": [2, 0.92], "16": [1, 0.99]}, "errors": null, "warnings": null}"""),
    Fixture("his5", "история 5", "История", "5", Some("47"),
      Vector(fx(3, 1), fx(1, .87), fx(0, 1), fx(X, 1), fx(2, 1), fx(3, 1), fx(1, .93)),
      """{"subject": "история", "grade": "5", "variant": "1", "participant_code": "47", "total_score": 10, "scores": {"1": [3, 1.0], "2": [1, 0.87], "3": [0, 1.0], "4": ["x", 1.0], "5": [2, 1.0], "6": [3, 1.0], "7": [1, 0.93]}, "errors": null, "warnings": null}"""),
    Fixture("phys7", "физика 7", "Физика", "7", None,
      Vector(fx(1, .98), fx(2, .52), fx(5, 1), fx(X, .65), fx(0, .98), fx(5, 1),
        fx(3, 1), fx(2, .66), fx(1, .99), fx(X, .99), fx(3, 1)),
      """{"subject": "физика", "grade": "7", "variant": "1", "participant_code": null, "total_score": 22, "scores": {"1": [1, 0.98], "2": [2, 0.52], "3": [5, 1.0], "4": ["x", 0.65], "5": [0, 0.98], "6": [5, 1.0], "7": [3, 1.0], "8": [2, 0.66], "9": [1, 0.99], "10": ["x", 0.99], "11": [3, 1.0]}, "errors": null, "warnings": ["Низкая уверенность в заданиях: 2"]}"""),
    Fixture("bio7", "биология 7", "Биология", "7", None,
      Vector(fx(1, .9), fx(1, .92), fx(0, .95), fx(X, .62), fx(1, .95), fx(1, .95),
        fx(1, .87), fx(0, .96), fx(0, .98), fx(1, .94), fx(3, 1), fx(1, .97),
        fx(1, .79), fx(X, 1), fx(1, .77), fx(0, .96), fx(X, .43), fx(1, .92), fx(1, .95)),
      """{"subject": "биология", "grade": "7", "variant": "1", "participant_code": null, "total_score": 14, "scores": {"1": [1, 0.9], "2": [1, 0.92], "3.1": [0, 0.95], "3.2": ["x", 0.62], "4.1": [1, 0.95], "4.2": [1, 0.95], "5.1": [1, 0.87], "5.2": [0, 0.96], "6.1": [0, 0.98], "6.2": [1, 0.94], "7.1": [3, 1.0], "7.2": [1, 0.97], "8.1": [1, 0.79], "8.2": ["x", 1.0], "9.1": [1, 0.77], "9.2": [0, 0.96], "9.3": ["x", 0.43], "10.1": [1, 0.92], "10.2": [1, 0.95]}, "errors": null, "warnings": ["Низкая уверенность в заданиях: 9.3"]}"""))

  private def specOf(f: Fixture, dialect: String): PageSpec = PageSpec(
    displaySubject = f.display, grade = f.grade, variant = "1",
    headerStyle = 0, hatOverflow = false,
    code = f.code, codeMissingBox = false,
    layoutKey = Some(f.key), tableKind = ConfigClean, cells = f.cells,
    nBandA = (f.cells.length + 1) / 2, dialect = dialect,
    dupCell = false, faintCells = false, specks = false, extraPage = false)

  for (f <- fixtures; dialect <- Seq("pdf", "html")) {
    test(s"golden ${f.name} ($dialect) byte-equal to reference response.json values") {
      val spec = specOf(f, dialect)
      val (payload, _, _) = Render.payload(spec)
      val got = Extractor.extractOne("conv-golden", 0, payload)
      assert(Json.responseJson(got) == f.expectedJson,
        s"\n got: ${Json.responseJson(got)}\n exp: ${f.expectedJson}\npayload:\n${payload.take(1800)}")
    }
  }

  test("golden plain-dialect page byte-equal (unit-confidence fixture)") {
    // plain char-grid payloads carry no confidence metadata (all 1.0),
    // so this fixture is synthetic rather than reference-derived
    val spec = PageSpec(
      displaySubject = "История", grade = "5", variant = "2",
      headerStyle = 0, hatOverflow = false,
      code = Some("314"), codeMissingBox = false,
      layoutKey = Some("история 5"), tableKind = ConfigClean,
      cells = Vector(fx(2, 1), fx(0, 1), fx(X, 1), fx(3, 1), fx(10, 1), fx(1, 1), fx(2, 1)),
      nBandA = 4, dialect = "plain",
      dupCell = false, faintCells = false, specks = false, extraPage = false)
    val (payload, _, _) = Render.payload(spec)
    val got = Extractor.extractOne("conv-plain", 0, payload)
    assert(Json.responseJson(got) ==
      """{"subject": "история", "grade": "5", "variant": "2", "participant_code": "314", "total_score": 8, "scores": {"1": [2, 1.0], "2": [0, 1.0], "3": ["x", 1.0], "4": [3, 1.0], "5": ["-", 1.0], "6": [1, 1.0], "7": [2, 1.0]}, "errors": null, "warnings": null}""",
      s"\npayload:\n$payload\n got: ${Json.responseJson(got)}")
  }

  test("golden serialization is stable under payload dialect") {
    for (f <- fixtures) {
      val jsons = Seq("pdf", "html").map { d =>
        val (p, _, _) = Render.payload(specOf(f, d))
        Json.responseJson(Extractor.extractOne("c", 0, p))
      }
      assert(jsons.distinct.size == 1)
    }
  }
}
