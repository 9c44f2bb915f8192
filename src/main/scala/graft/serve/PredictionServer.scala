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
  *    (app.py:110-112's result frame). Batch size is bounded by the
  *    upload, so collecting the projected 2-column result is safe.
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
    server.createContext("/health", handler(handleHealth))
    server.createContext("/predict/batch", handler(handleBatch))
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
          respond(ex, 400, "application/json",
            mapper.createObjectNode()
              .put("error", String.valueOf(e.getMessage)).toString)
      } finally ex.close()

  private def respond(ex: HttpExchange, code: Int, contentType: String,
      body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, bytes.length)
    ex.getResponseBody.write(bytes)
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
      case DoubleType | FloatType if n.isNumber => Some(n.asDouble())
      case LongType if n.canConvertToLong => Some(n.asLong())
      case IntegerType if n.canConvertToInt => Some(n.asInt())
      case StringType if n.isTextual => Some(n.asText())
      case BooleanType if n.isBoolean => Some(n.asBoolean())
      case _ => throw new IllegalArgumentException(
        s"field '$name' expects ${dt.simpleString}, got ${n.getNodeType}")
    }
  }

  private def handleBatch(ex: HttpExchange): (Int, String, String) = {
    require(ex.getRequestMethod == "POST", "POST a CSV body with a header row")
    // app.py:137-143 — spool the upload to a temp file for spark.read.csv
    val tmp = java.nio.file.Files.createTempFile("graft-serve-batch", ".csv")
    try {
      java.nio.file.Files.copy(ex.getRequestBody, tmp,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val input = spark.read.option("header", "true")
        .option("inferSchema", "true").csv(tmp.toString)
      val rows = predictor.predictBatch(input)
        .select("id_annonce", "prediction_price").collect()
      val csv = new StringBuilder("id_annonce,prediction_price\n")
      rows.foreach { r =>
        csv.append(r.get(0)).append(',')
          .append("%.2f".format(r.getDouble(1))).append('\n')
      }
      (200, "text/csv", csv.toString)
    } finally java.nio.file.Files.deleteIfExists(tmp)
  }
}

/** `runMain graft.serve.ServeMain --model-dir D [--model-type rf|lr|gbt]
  * [--schema-from sample.parquet] [--port N]` — loads the artifacts the
  * `graft.Main train` CLI persisted (same layout as runPredict) and
  * serves them. The single-row input contract comes from `--schema-from`
  * (any file readable by spark.read.parquet whose schema is the raw input
  * row), defaulting to the train-time schema recorded alongside the model
  * if present.
  */
object ServeMain {
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
    val schema = spark.read.parquet(opts.getOrElse("schema-from",
      sys.error("--schema-from <sample.parquet> is required"))).schema
    val prepared = predictor.prepareSingle(spark, schema)
    val srv = new PredictionServer(spark, predictor, prepared, schema, port)
    val addr = srv.start()
    println(s"""{"status":"serving","port":${addr.getPort}}""")
    Thread.currentThread().join() // serve until killed
  }
}
