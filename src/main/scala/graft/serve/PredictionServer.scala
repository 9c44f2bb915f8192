package graft.serve

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

import graft.infer.{PreparedPredictor, Predictor}

/** HTTP serving layer over the inference path — the reference's webapp
  * surface (ref: src/webapp/app.py:1-309, Streamlit single + batch UI)
  * re-expressed as a JSON/CSV API on the JDK's built-in HttpServer (no
  * framework dependency; Jackson ships with Spark).
  *
  * Two prediction modes, mirroring the reference exactly:
  *  - `POST /predict` — one property as a flat JSON object (the "single
  *    prediction" form). Served by [[PreparedPredictor]]: zero Spark jobs,
  *    zero planning per request — the compiled Project/Filter chain runs
  *    on the handler thread in microseconds, so a driver-side server
  *    sustains thousands of req/s while the cluster stays free for batch
  *    work. A row dropped by the strict null policy returns
  *    `prediction_price: null, dropped: true` (app.py's failed-transform
  *    warning path).
  *  - `POST /predict/batch` — a CSV upload (app.py's file_uploader flow,
  *    same format as X_test.csv). This is a REAL distributed job:
  *    `spark.read.csv` → full feature transform → model → smearing
  *    inverse, returned as `id_annonce,prediction_price` CSV
  *    (app.py:110-112's result frame). The result is written by the
  *    executors and STREAMED to the response — no driver-side collect,
  *    so batch size is bounded by cluster capacity, not driver heap.
  *
  * Single-row eval is serialized on a lock: catalyst `Expression.eval`
  * trees may hold per-instance mutable state (codegen-fallback exprs,
  * initialized Nondeterministic nodes), so one compiled chain must not
  * run on two threads at once. The critical section is microseconds; for
  * multi-core serving run one server per executor-sized pool instead of
  * removing the lock.
  */
final class PredictionServer(
    spark: SparkSession,
    predictor: Predictor,
    prepared: PreparedPredictor,
    schema: StructType,
    port: Int = 0) {

  private val mapper = new ObjectMapper()
  private var server: HttpServer = _
  private val lock = new Object

  def start(): InetSocketAddress = synchronized {
    require(server == null, "already started")
    server = HttpServer.create(new InetSocketAddress(port), 0)
    server.createContext("/", handler(handleForm))
    server.createContext("/health", handler(handleHealth))
    server.createContext("/predict/batch", streamingHandler(handleBatch))
    server.createContext("/predict", handler(handleSingle))
    server.setExecutor(java.util.concurrent.Executors.newFixedThreadPool(8))
    server.start()
    server.getAddress
  }

  def stop(): Unit = synchronized {
    if (server != null) { server.stop(0); server = null }
  }

  private def handler(f: HttpExchange => (Int, String, String)): HttpHandler =
    (ex: HttpExchange) =>
      try {
        val (code, contentType, body) = f(ex)
        respond(ex, code, contentType, body)
      } catch {
        case e: Exception =>
          respond(ex, errorCode(e), "application/json",
            mapper.createObjectNode()
              .put("error", String.valueOf(e.getMessage)).toString)
      } finally ex.close()

  /** [[handler]] for endpoints that stream their own response body
    * (the batch path): `f` commits headers and writes bytes itself. An
    * exception BEFORE the commit still produces the clean JSON error;
    * one after it (a failure mid-stream) can only truncate the chunked
    * response — the client sees a protocol error instead of a silently
    * short file, which is the correct failure mode for a stream.
    */
  private def streamingHandler(f: HttpExchange => Unit): HttpHandler =
    (ex: HttpExchange) =>
      try f(ex)
      catch {
        case e: Exception =>
          try respond(ex, errorCode(e), "application/json",
            mapper.createObjectNode()
              .put("error", String.valueOf(e.getMessage)).toString)
          catch { case _: java.io.IOException => () }
      } finally ex.close()

  /** Client errors (schema violations via require/coerce, malformed
    * JSON) are 400; anything else is a genuine server-side failure and
    * must say so — a Spark executor error is not the caller's fault.
    */
  private def errorCode(e: Exception): Int = e match {
    case _: IllegalArgumentException => 400
    case _: com.fasterxml.jackson.core.JsonProcessingException => 400
    case _ => 500
  }

  private def respond(ex: HttpExchange, code: Int, contentType: String,
      body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
  }

  /** GET / — a minimal HTML form over the same two flows the reference's
    * Streamlit page offers (ref: src/webapp/app.py:184-309): one input per
    * schema field posting JSON to /predict, plus a CSV file upload posting
    * to /predict/batch. Schema-driven (numeric fields get number inputs),
    * no assets, no framework — the API stays the real surface; this is the
    * widget on top.
    */
  private def handleForm(ex: HttpExchange): (Int, String, String) = {
    if (ex.getRequestURI.getPath != "/")
      return (404, "application/json", """{"error":"not found"}""")
    def esc(s: String) = s.replace("&", "&amp;").replace("<", "&lt;")
      .replace(">", "&gt;").replace("\"", "&quot;")
    val fields = schema.fields.map { f =>
      val (typ, step) = f.dataType match {
        case DoubleType | FloatType => ("number", " step=\"any\"")
        case LongType | IntegerType => ("number", " step=\"1\"")
        case _ => ("text", "")
      }
      s"""<label>${esc(f.name)} <small>(${esc(f.dataType.simpleString)})</small>
         |<input name="${esc(f.name)}" type="$typ"$step></label>""".stripMargin
    }.mkString("\n")
    val html =
      s"""<!doctype html><html><head><meta charset="utf-8">
         |<title>graft prediction server</title></head><body>
         |<h1>Property price prediction</h1>
         |<form id="single">$fields
         |<button type="submit">Predict</button></form>
         |<pre id="out"></pre>
         |<h2>Batch (CSV upload)</h2>
         |<form id="batch"><input type="file" name="csv" accept=".csv">
         |<button type="submit">Predict batch</button></form>
         |<pre id="bout"></pre>
         |<script>
         |document.getElementById('single').addEventListener('submit', async e => {
         |  e.preventDefault();
         |  const body = {};
         |  for (const el of e.target.elements) {
         |    if (!el.name || el.value === '') continue;
         |    body[el.name] = el.type === 'number' ? Number(el.value) : el.value;
         |  }
         |  const r = await fetch('/predict', {method: 'POST',
         |    headers: {'Content-Type': 'application/json'},
         |    body: JSON.stringify(body)});
         |  document.getElementById('out').textContent = await r.text();
         |});
         |document.getElementById('batch').addEventListener('submit', async e => {
         |  e.preventDefault();
         |  const f = e.target.elements['csv'].files[0];
         |  if (!f) return;
         |  const r = await fetch('/predict/batch', {method: 'POST', body: f});
         |  document.getElementById('bout').textContent = await r.text();
         |});
         |</script></body></html>""".stripMargin
    (200, "text/html", html)
  }

  private def handleHealth(ex: HttpExchange): (Int, String, String) = {
    val node = mapper.createObjectNode().put("status", "ok")
    val fields = node.putArray("schema")
    schema.fields.foreach(f =>
      fields.addObject().put("name", f.name)
        .put("type", f.dataType.simpleString))
    (200, "application/json", node.toString)
  }

  private def handleSingle(ex: HttpExchange): (Int, String, String) = {
    require(ex.getRequestMethod == "POST", "POST a JSON object")
    val json = mapper.readTree(ex.getRequestBody)
    require(json != null && json.isObject, "body must be a JSON object")
    val values: Map[String, Any] = schema.fields.flatMap { f =>
      coerce(json.get(f.name), f.dataType, f.name).map(f.name -> _)
    }.toMap
    val pred = lock.synchronized { prepared.predict(values) }
    val node = mapper.createObjectNode()
    pred match {
      case Some(p) => node.put("prediction_price", p)
      case None => node.putNull("prediction_price"); node.put("dropped", true)
    }
    (200, "application/json", node.toString)
  }

  /** JSON → the schema's JVM type; wrong-typed values fail the request
    * rather than silently predicting on a null.
    */
  private def coerce(n: JsonNode, dt: DataType, name: String): Option[Any] = {
    if (n == null || n.isNull) return None
    dt match {
      case DoubleType if n.isNumber => Some(n.asDouble())
      // RowEncoder's serializer validates external types strictly: a
      // FloatType field must receive a java.lang.Float, not a Double.
      case FloatType if n.isNumber => Some(n.asDouble().toFloat)
      case LongType if n.canConvertToLong => Some(n.asLong())
      case IntegerType if n.canConvertToInt => Some(n.asInt())
      case StringType if n.isTextual => Some(n.asText())
      case BooleanType if n.isBoolean => Some(n.asBoolean())
      case _ => throw new IllegalArgumentException(
        s"field '$name' expects ${dt.simpleString}, got ${n.getNodeType}")
    }
  }

  /** Batch predictions WITHOUT a driver-side collect (round-15 advice:
    * this was the one unbounded `collect()` left in the tree): the
    * 2-column result is formatted and written BY THE EXECUTORS as a
    * distributed CSV job, and the handler then streams the part files
    * into a chunked response — O(io-buffer) driver heap at any batch
    * size, where the old `collect()` held the whole result. Spark's
    * `format_string` is Locale.US by construction, so a comma-decimal
    * default locale (fr_FR) can't corrupt the 2-column CSV (the old
    * Locale.ROOT guard, now enforced executor-side). The Spark job runs
    * to completion BEFORE the response commits, so analysis errors (a
    * CSV missing model columns) still surface as a clean 400.
    *
    * FILESYSTEM ASSUMPTION (round-16 advice, stated rather than hidden):
    * the executors write their part files to a driver-local temp dir and
    * the handler thread reads them back — valid in local mode (this
    * server's deployment shape, like the reference's Streamlit app) and
    * consistent with the pre-existing driver-local upload spool above,
    * but a MULTI-NODE deployment must point both spool and output at a
    * shared scheme-aware location (hdfs:///s3a://, resolved through the
    * Hadoop FileSystem like graft.util.IndexSidecar does) or the part
    * files land on machines the handler can't see. The old collect()
    * path had no such assumption — it traded it for unbounded driver
    * heap; this trade is the right one for the single-node twin.
    */
  private def handleBatch(ex: HttpExchange): Unit = {
    require(ex.getRequestMethod == "POST", "POST a CSV body with a header row")
    // app.py:137-143 — spool the upload to a temp file for spark.read.csv
    val tmp = java.nio.file.Files.createTempFile("graft-serve-batch", ".csv")
    val outDir = java.nio.file.Files.createTempDirectory("graft-serve-out")
    try {
      java.nio.file.Files.copy(ex.getRequestBody, tmp,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val input = spark.read.option("header", "true")
        .option("inferSchema", "true").csv(tmp.toString)
      import org.apache.spark.sql.functions.{col, format_string}
      try predictor.predictBatch(input)
        .select(col("id_annonce"),
          format_string("%.2f", col("prediction_price")).as("prediction_price"))
        .write.mode("overwrite").csv(outDir.toString)
      catch {
        // a CSV missing required columns fails analysis — that is the
        // caller's upload, not a server fault: surface it as a 400
        case e: org.apache.spark.sql.AnalysisException =>
          throw new IllegalArgumentException(
            s"batch CSV does not match the model's input schema: ${e.getMessage}")
      }
      ex.getResponseHeaders.set("Content-Type", "text/csv")
      ex.sendResponseHeaders(200, 0) // chunked — length unknown unbuffered
      val os = ex.getResponseBody
      os.write("id_annonce,prediction_price\n".getBytes(UTF_8))
      val parts = java.nio.file.Files.list(outDir)
      try parts.filter(_.getFileName.toString.startsWith("part-"))
        .sorted().forEachOrdered { p =>
          java.nio.file.Files.copy(p, os): Unit
        }
      finally parts.close()
      os.flush()
    } finally {
      java.nio.file.Files.deleteIfExists(tmp)
      val walk = java.nio.file.Files.walk(outDir)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEachOrdered(p => java.nio.file.Files.deleteIfExists(p): Unit)
      finally walk.close()
    }
  }
}

/** `runMain graft.serve.ServeMain --model-dir D [--model-type rf|lr|gbt]
  * [--schema-from sample.parquet] [--port N]` — loads the artifacts the
  * `graft.Main train` CLI persisted (same layout as runPredict) and
  * serves them. The single-row input contract comes from `--schema-from`
  * (any file readable by spark.read.parquet whose schema is the raw input
  * row), defaulting to the train-time schema `graft.Main train` records
  * at `<model-dir>/input_schema.json`; with neither present the server
  * refuses to start rather than guess.
  */
object ServeMain {

  /** The raw-input schema `graft.Main train` recorded alongside the model
    * (StructType.json at `<model-dir>/input_schema.json`), if present.
    */
  def recordedSchema(modelDir: String): Option[StructType] = {
    val p = java.nio.file.Paths.get(s"$modelDir/input_schema.json")
    if (!java.nio.file.Files.exists(p)) None
    else Some(DataType.fromJson(java.nio.file.Files.readString(p))
      .asInstanceOf[StructType])
  }
  def main(args: Array[String]): Unit = {
    val opts = args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
    val modelDir = opts.getOrElse("model-dir",
      sys.error("--model-dir is required"))
    val modelType = opts.getOrElse("model-type", "rf")
    val port = opts.getOrElse("port", "8080").toInt
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val fe = new graft.features.FeatureEngineering("strict")
      .load(s"$modelDir/feature_engineering")
    val tt = new graft.features.TargetTransformer("price")
      .load(s"$modelDir/target_transform.json")
    val model: org.apache.spark.ml.Transformer = modelType match {
      case "rf" => org.apache.spark.ml.regression.RandomForestRegressionModel
        .load(s"$modelDir/$modelType")
      case "lr" => org.apache.spark.ml.regression.LinearRegressionModel
        .load(s"$modelDir/$modelType")
      case "gbt" => org.apache.spark.ml.regression.GBTRegressionModel
        .load(s"$modelDir/$modelType")
      case other => sys.error(s"unknown --model-type $other")
    }
    val predictor = new Predictor(fe, model, tt)
    val schema = opts.get("schema-from")
      .map(p => spark.read.parquet(p).schema)
      .orElse(recordedSchema(modelDir))
      .getOrElse(sys.error(
        s"--schema-from <sample.parquet> is required ($modelDir has no " +
          "recorded input_schema.json — retrain with the current CLI or " +
          "pass the flag)"))
    val prepared = predictor.prepareSingle(spark, schema)
    val srv = new PredictionServer(spark, predictor, prepared, schema, port)
    val addr = srv.start()
    println(s"""{"status":"serving","port":${addr.getPort}}""")
    Thread.currentThread().join() // serve until killed
  }
}
