package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.file.Files

import graft.api.{VectorDb, VectorDbServer}
import graft.embed.Embedder

/** End-to-end parity gate for the three manual mains (VERDICT r11
  * item 8): the reference's `demo.sh` is its only e2e artifact — clone
  * a repo, convert it, serve it, query it, read the stats — so the
  * Spark re-expression deserves the same drive as one spec:
  *
  *   1. `Demo.sampleRepo()` materializes the stand-in worktree (the
  *      clone step, minus the network this sandbox lacks),
  *   2. `Convert.run` converts it (scan -> filter -> chunk -> embed ->
  *      parquet, with the A8 observe counters),
  *   3. `Demo.run` replays the full convert -> query -> stats flow,
  *   4. a live `VectorDbServer` on an EPHEMERAL port ingests the
  *      converted chunks over the wire and answers /query + /stats —
  *      `graft.Serve`'s exact construction (VectorDb + VectorDbServer),
  *      minus only the `Thread.join()` that makes Serve a daemon.
  */
class DemoSpec extends SparkSpec {
  import spark.implicits._

  private val client = HttpClient.newHttpClient()

  private def get(port: Int, path: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .GET().build(), HttpResponse.BodyHandlers.ofString())

  private def post(port: Int, path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  private def parse(json: String) = spark.read.json(Seq(json).toDS())

  test("demo e2e: sample tree -> convert -> serve -> query -> stats") {
    val src = Demo.sampleRepo()
    val out = Files.createTempDirectory("graft_demo_out").toString + "/corpus"

    // ---- convert (the reference's convert subcommand) ----
    val counters = Convert.run(spark, src, out)
    val chunks = counters("chunks_created").asInstanceOf[Long]
    assert(chunks > 0L, s"convert produced no chunks: $counters")
    val corpus = spark.read.parquet(out)
    assert(corpus.count() == chunks)
    // the filter battery held: no hidden paths, no binary extension
    val paths = corpus.select("path").distinct().as[String].collect()
    assert(paths.nonEmpty)
    assert(!paths.exists(_.contains(".hidden")), paths.mkString(","))
    assert(!paths.exists(_.endsWith(".bin")), paths.mkString(","))

    // ---- the demo's own convert -> query -> stats flow ----
    val report = Demo.run(spark, src, "how does the vector database api work")
    assert(report.files >= 3L, report.toString) // api.py, store.py, README.md
    assert(report.chunks > 0L && report.totalChunks == report.chunks,
      report.toString)
    assert(report.uniqueFiles == report.files, report.toString)
    assert(report.hits.nonEmpty, "demo query returned no hits")
    // ranked by score desc; the query's subject files are retrieved
    val scores = report.hits.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sortBy(-_)), scores.mkString(","))
    val hitPaths = report.hits.map(_.getAs[String]("path")).toSet
    assert(hitPaths.exists(_.endsWith("api.py")) &&
      hitPaths.exists(_.endsWith("README.md")),
      report.hits.map(_.toString).mkString("\n"))
    assert(report.byExtension.keySet.contains(".py"), report.byExtension)

    // ---- serve the converted corpus on an ephemeral port ----
    val storeDir = Files.createTempDirectory("graft_demo_store").toString + "/store"
    val db = new VectorDb(spark, storeDir)
    val srv = new VectorDbServer(spark, db, port = 0)
    srv.start()
    try {
      val port = srv.boundPort
      val docsJson = corpus.toJSON.collect().mkString("[", ",", "]")
      val add = post(port, "/add_documents", s"""{"documents": $docsJson}""")
      assert(add.statusCode() == 200, add.body())
      assert(parse(add.body()).head().getAs[Long]("added") == chunks)

      // wire query with the demo's own embedded query text
      val qVec = Embedder.Default
        .embed("how does the vector database api work").map(_.toDouble)
      val q = post(port, "/query",
        s"""{"query_embedding": [${qVec.mkString(",")}], "top_k": 5}""")
      assert(q.statusCode() == 200, q.body())
      val hits = parse(q.body())
        .selectExpr("explode(results) as r").selectExpr("r.path", "r.score")
        .collect()
      assert(hits.nonEmpty, q.body())
      // the wire top hit must agree with the in-process demo's top hit
      assert(hits.head.getString(0) == report.hits.head.getAs[String]("path"),
        hits.map(_.toString).mkString("\n"))

      // wire stats must agree with what we ingested
      val st = parse(get(port, "/stats").body()).head()
      assert(st.getAs[Long]("total_documents") == chunks, st.toString)
      assert(st.getAs[Long]("unique_files") == report.files, st.toString)

      val h = parse(get(port, "/health").body()).head()
      assert(h.getAs[String]("status") == "healthy", h.toString)
    } finally srv.stop()
  }
}
