package graft.estimate

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** The reference's LLM time-estimation consumer
  * (`/root/reference/estimate_time.py`): assemble an estimation prompt
  * from a function doc + retrieved vector-db results, obtain a JSON
  * estimate from a model, and render the markdown report. The engine
  * side of this flow (retrieval + context assembly under a budget) is
  * the q77 operator; this module is the CLIENT layer — prompt template
  * (`estimate_time.py:34-77`) and report formatter (`:106-153`)
  * replicated exactly, with the network LLM call behind a seam.
  *
  * The LLM itself is EXTERNAL in the reference (an HTTP chat-completions
  * endpoint); this sandbox has no egress, so [[TimeEstimator]] is the
  * integration seam and [[HeuristicEstimator]] the deterministic offline
  * stand-in — the same honesty policy as the multimodal codec stubs:
  * plumbing, formats, and error paths are real and tested; the model is
  * replaceable.
  */
object Estimate {

  /** The estimation prompt (`estimate_time.py:34-77`): function doc +
    * repository context + the response-shape instructions.
    */
  def assemblePrompt(functionDoc: String, vectorResults: String): String =
    s"""
       |You are an expert software developer tasked with estimating implementation time.
       |
       |# Function Documentation:
       |$functionDoc
       |
       |# Relevant Code and Context from the Repository:
       |$vectorResults
       |
       |Based on the function documentation and the repository context, please provide:
       |
       |1. An estimated time range to implement this functionality (in hours or days)
       |2. A complexity assessment (Low, Medium, High)
       |3. Key factors that influence the time estimate
       |4. Potential challenges or risks
       |5. Breakdown of implementation tasks with sub-estimates
       |
       |Format your response as JSON with the following structure:
       |{
       |  "time_estimate": {"min_hours": number, "max_hours": number, "confidence": "Low|Medium|High"},
       |  "complexity": "Low|Medium|High",
       |  "key_factors": ["factor 1", ...],
       |  "potential_challenges": ["challenge 1", ...],
       |  "tasks": [{"name": "task 1", "hours": number, "description": "description"}, ...]
       |}
       |""".stripMargin

  /** The model seam (`estimate_time.py:80-103` calls an external
    * chat-completions API here): prompt in, JSON estimate text out.
    */
  trait TimeEstimator {
    def estimate(prompt: String): String
  }

  /** Deterministic offline stand-in: complexity scales with how much
    * repository context the retrieval produced (the only signal in the
    * prompt a heuristic can honestly use), hours with the doc size.
    * Same prompt → same JSON, so report generation is testable
    * end-to-end without a network.
    */
  object HeuristicEstimator extends TimeEstimator {
    def estimate(prompt: String): String = {
      val ctx = prompt.length
      val complexity =
        if (ctx < 2000) "Low" else if (ctx < 10000) "Medium" else "High"
      val base = math.max(1L, ctx / 500L)
      s"""{
         |  "time_estimate": {"min_hours": $base, "max_hours": ${base * 3}, "confidence": "Medium"},
         |  "complexity": "$complexity",
         |  "key_factors": ["${ctx} chars of assembled context", "deterministic offline estimator"],
         |  "potential_challenges": ["estimate produced without a live model"],
         |  "tasks": [
         |    {"name": "implementation", "hours": ${base * 2}, "description": "core implementation"},
         |    {"name": "tests", "hours": $base, "description": "specs and verification"}
         |  ]
         |}""".stripMargin
    }
  }

  private val mapper = new ObjectMapper()

  /** Render a number the way python's f-string does: integral values
    * print without a decimal point, floats with one.
    */
  private def num(n: JsonNode): String =
    if (n.isIntegralNumber) n.asLong().toString else n.asDouble().toString

  /** The markdown report (`estimate_time.py:106-153`), section for
    * section, including both error paths: unparseable JSON and a
    * missing key.
    */
  def formatReport(estimateJson: String): String = {
    val root =
      try mapper.readTree(estimateJson)
      catch {
        case _: Exception =>
          return "Error: Could not parse LLM response as JSON.\n\nRaw response:\n" +
            estimateJson
      }
    if (root == null || !root.isObject)
      return "Error: Could not parse LLM response as JSON.\n\nRaw response:\n" +
        estimateJson
    def get(node: JsonNode, key: String): JsonNode = {
      val v = node.get(key)
      if (v == null) throw new NoSuchElementException(key)
      v
    }
    try {
      val report = scala.collection.mutable.ArrayBuffer.empty[String]
      report += "# Implementation Time Estimate Report\n"
      val timeEst = get(root, "time_estimate")
      report += "## Time Estimate"
      report += s"- **Range**: ${num(get(timeEst, "min_hours"))} to ${num(get(timeEst, "max_hours"))} hours"
      report += s"- **Confidence**: ${get(timeEst, "confidence").asText()}"
      report += ""
      report += "## Complexity"
      report += s"- **Assessment**: ${get(root, "complexity").asText()}"
      report += ""
      report += "## Key Factors"
      get(root, "key_factors").elements().asScala
        .foreach(f => report += s"- ${f.asText()}")
      report += ""
      report += "## Potential Challenges"
      get(root, "potential_challenges").elements().asScala
        .foreach(c => report += s"- ${c.asText()}")
      report += ""
      report += "## Implementation Tasks"
      var totalIsIntegral = true
      var total = 0.0
      get(root, "tasks").elements().asScala.foreach { t =>
        val hours = get(t, "hours")
        report += s"### ${get(t, "name").asText()} (${num(hours)} hours)"
        report += get(t, "description").asText()
        report += ""
        totalIsIntegral &&= hours.isIntegralNumber
        total += hours.asDouble()
      }
      val totalStr = if (totalIsIntegral) total.toLong.toString else total.toString
      report += s"**Total Hours (Sum of Tasks)**: $totalStr"
      report.mkString("\n")
    } catch {
      case e: NoSuchElementException =>
        s"Error: Missing key in JSON response: '${e.getMessage}'.\n\nRaw response:\n" +
          estimateJson
    }
  }

  /** The CLI (`estimate_time.py:156-199`): read the function doc and the
    * vector-db results file (the reference consumes a results FILE, not
    * the live store — retrieval is the query client's job, §3.2 / q77),
    * assemble the prompt, estimate, render.
    *
    * Usage: runMain graft.estimate.Estimate <functionDocFile> <vectorResultsFile> [outFile]
    */
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: graft.estimate.Estimate <functionDocFile> <vectorResultsFile> [outFile]")
    val doc = java.nio.file.Files.readString(java.nio.file.Paths.get(args(0)))
    val results = java.nio.file.Files.readString(java.nio.file.Paths.get(args(1)))
    val report = formatReport(
      HeuristicEstimator.estimate(assemblePrompt(doc, results)))
    args.lift(2) match {
      case Some(out) =>
        java.nio.file.Files.writeString(java.nio.file.Paths.get(out), report)
        println(s"[estimate] report written to $out")
      case None => println(report)
    }
  }
}
