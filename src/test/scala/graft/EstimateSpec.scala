package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.estimate.Estimate

/** The estimation consumer is pure driver-side string work (no Spark) —
  * the report formatter and error paths mirror estimate_time.py exactly.
  */
class EstimateSpec extends AnyFunSuite {

  test("assemblePrompt embeds doc and context under the reference headings") {
    val p = Estimate.assemblePrompt("DOC BODY", "CTX BODY")
    assert(p.contains("# Function Documentation:\nDOC BODY"))
    assert(p.contains("# Relevant Code and Context from the Repository:\nCTX BODY"))
    assert(p.contains("\"time_estimate\""))
  }

  test("formatReport renders every section with python-style numbers") {
    val json =
      """{
        |  "time_estimate": {"min_hours": 4, "max_hours": 12.5, "confidence": "High"},
        |  "complexity": "Medium",
        |  "key_factors": ["existing helpers", "clear spec"],
        |  "potential_challenges": ["tricky edge cases"],
        |  "tasks": [
        |    {"name": "core", "hours": 6, "description": "main logic"},
        |    {"name": "tests", "hours": 2, "description": "spec coverage"}
        |  ]
        |}""".stripMargin
    val r = Estimate.formatReport(json)
    assert(r.startsWith("# Implementation Time Estimate Report\n"))
    assert(r.contains("- **Range**: 4 to 12.5 hours"))  // int prints bare, float keeps the point
    assert(r.contains("- **Confidence**: High"))
    assert(r.contains("- **Assessment**: Medium"))
    assert(r.contains("- existing helpers"))
    assert(r.contains("- tricky edge cases"))
    assert(r.contains("### core (6 hours)\nmain logic"))
    assert(r.endsWith("**Total Hours (Sum of Tasks)**: 8"))
  }

  test("formatReport error paths match the reference") {
    val bad = Estimate.formatReport("not json at all")
    assert(bad.startsWith("Error: Could not parse LLM response as JSON."))
    assert(bad.endsWith("not json at all"))
    val missing = Estimate.formatReport("""{"complexity": "Low"}""")
    assert(missing.startsWith("Error: Missing key in JSON response: 'time_estimate'."))
  }

  test("heuristic estimator is deterministic and always renders cleanly") {
    val prompt = Estimate.assemblePrompt("doc " * 100, "ctx " * 500)
    val a = Estimate.HeuristicEstimator.estimate(prompt)
    assert(a == Estimate.HeuristicEstimator.estimate(prompt))
    val report = Estimate.formatReport(a)
    assert(report.contains("## Implementation Tasks"))
    assert(!report.startsWith("Error"))
  }
}
