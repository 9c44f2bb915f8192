package graft.serve

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

import graft.SparkSpec
import graft.features.{Encoding, TargetTransformer}
import graft.infer.Predictor
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** End-to-end HTTP parity: the served single and batch predictions must
  * equal direct calls into the same fitted pipeline (the reference's
  * webapp renders exactly these two numbers — app.py predict_single /
  * predict_batch).
  */
class PredictionServerSpec extends SparkSpec {
  import spark.implicits._

  private def listings: DataFrame = {
    val types = Seq("maison", "appartement", "propriété")
    (1 to 300).map { i =>
      val t = types(i % 3)
      val size = 30.0 + (i % 150)
      val price = size * 3000.0 + (i % 3) * 50000.0
      (i.toLong, t, size, price)
    }.toDF("id_annonce", "property_type", "size", "price")
  }

  private lazy val fitted = {
    val fe = Encoding.buildPipeline(Seq("property_type"), Seq("size"),
      handleInvalid = "skip").fit(listings)
    val tt = new TargetTransformer("price").fit(listings)
    val train = tt.transform(fe.transform(listings))
    val model = graft.ml.Trainer.linear("log_price").setSolver("normal")
      .fit(train)
    new Predictor(fe, model, tt)
  }

  private val inputSchema = StructType(Seq(
    StructField("id_annonce", LongType),
    StructField("property_type", StringType),
    StructField("size", DoubleType)))

  private val client = HttpClient.newHttpClient()

  private def withServer(f: Int => Unit): Unit = {
    val srv = new PredictionServer(spark, fitted,
      fitted.prepareSingle(spark, inputSchema), inputSchema)
    val addr = srv.start()
    try f(addr.getPort) finally srv.stop()
  }

  private def post(port: Int, path: String, body: String): HttpResponse[String] =
    client.send(
      HttpRequest.newBuilder(URI.create(s"http://localhost:$port$path"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("health reports the input schema") {
    withServer { port =>
      val r = client.send(
        HttpRequest.newBuilder(
          URI.create(s"http://localhost:$port/health")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      r.statusCode() shouldBe 200
      r.body() should include(""""status":"ok"""")
      r.body() should include(""""name":"property_type"""")
    }
  }

  test("GET / serves an HTML form wired to /predict with one input per field") {
    withServer { port =>
      val r = client.send(
        HttpRequest.newBuilder(
          URI.create(s"http://localhost:$port/")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      r.statusCode() shouldBe 200
      r.headers().firstValue("Content-Type").get should include("text/html")
      for (f <- inputSchema.fields)
        r.body() should include(s"""name="${f.name}"""")
      r.body() should include("fetch('/predict'")
      r.body() should include("fetch('/predict/batch'")
      // anything else under / is a 404, not the form
      val miss = client.send(
        HttpRequest.newBuilder(
          URI.create(s"http://localhost:$port/nope")).GET().build(),
        HttpResponse.BodyHandlers.ofString())
      miss.statusCode() shouldBe 404
    }
  }

  test("POST /predict equals the direct prepared-predictor call") {
    withServer { port =>
      val direct = fitted.prepareSingle(spark, inputSchema)
        .predict(Map("id_annonce" -> 1L,
          "property_type" -> "maison", "size" -> 75.0)).get
      val r = post(port, "/predict",
        """{"id_annonce": 1, "property_type": "maison", "size": 75.0}""")
      r.statusCode() shouldBe 200
      val served = """"prediction_price":([-0-9.E]+)""".r
        .findFirstMatchIn(r.body()).get.group(1).toDouble
      served shouldBe direct +- math.abs(direct) * 1e-9
    }
  }

  test("POST /predict with a schema-violating field is a 400, not a null row") {
    withServer { port =>
      val r = post(port, "/predict",
        """{"property_type": 42, "size": 75.0}""")
      r.statusCode() shouldBe 400
      r.body() should include("property_type")
    }
  }

  test("unknown-category row dropped by handleInvalid=skip reports dropped") {
    withServer { port =>
      val r = post(port, "/predict",
        """{"property_type": "château", "size": 75.0}""")
      r.statusCode() shouldBe 200
      r.body() should include(""""prediction_price":null""")
      r.body() should include(""""dropped":true""")
    }
  }

  test("a FloatType schema field round-trips through /predict") {
    // RowEncoder validates external types: FloatType must receive a
    // java.lang.Float — a Double here fails every request on that schema
    val floatSchema = StructType(Seq(
      StructField("id_annonce", LongType),
      StructField("property_type", StringType),
      StructField("size", FloatType)))
    val srv = new PredictionServer(spark, fitted,
      fitted.prepareSingle(spark, floatSchema), floatSchema)
    val addr = srv.start()
    try {
      val r = post(addr.getPort, "/predict",
        """{"id_annonce": 1, "property_type": "maison", "size": 75.0}""")
      r.statusCode() shouldBe 200
      val served = """"prediction_price":([-0-9.E]+)""".r
        .findFirstMatchIn(r.body()).get.group(1).toDouble
      val direct = fitted.prepareSingle(spark, floatSchema)
        .predict(Map("id_annonce" -> 1L,
          "property_type" -> "maison", "size" -> 75.0f)).get
      served shouldBe direct +- math.abs(direct) * 1e-9
    } finally srv.stop()
  }

  test("batch CSV that doesn't match the model's input is a 400") {
    withServer { port =>
      val r = post(port, "/predict/batch", "id_annonce,oops\n1,2\n")
      r.statusCode() shouldBe 400
    }
  }

  test("a server-side failure surfaces as 500, not 400") {
    val failing = new graft.infer.Predictor(
      (_: DataFrame) => throw new RuntimeException("executor lost"),
      fitted.model, fitted.targetTransformer)
    val srv = new PredictionServer(spark, failing,
      fitted.prepareSingle(spark, inputSchema), inputSchema)
    val addr = srv.start()
    try {
      val r = post(addr.getPort, "/predict/batch",
        "id_annonce,property_type,size\n1,maison,75.0\n")
      r.statusCode() shouldBe 500
      r.body() should include("executor lost")
    } finally srv.stop()
  }

  test("POST /predict/batch CSV equals predictBatch on the same rows") {
    withServer { port =>
      val csv = "id_annonce,property_type,size\n" +
        "10,maison,75.0\n11,appartement,100.0\n12,propriété,130.0\n"
      val r = post(port, "/predict/batch", csv)
      r.statusCode() shouldBe 200
      val lines = r.body().trim.split("\n")
      lines.head shouldBe "id_annonce,prediction_price"
      lines.length shouldBe 4
      val served = lines.drop(1).map { l =>
        val Array(id, p) = l.split(","); id.toLong -> p.toDouble
      }.toMap
      val direct = fitted.predictBatch(
        Seq((10L, "maison", 75.0), (11L, "appartement", 100.0),
          (12L, "propriété", 130.0))
          .toDF("id_annonce", "property_type", "size"))
        .select(col("id_annonce"), col("prediction_price")).collect()
        .map(row => row.getLong(0) -> row.getDouble(1)).toMap
      for ((id, p) <- direct)
        served(id) shouldBe (math.floor(p * 100 + 0.5) / 100) +- 0.011
    }
  }
}
