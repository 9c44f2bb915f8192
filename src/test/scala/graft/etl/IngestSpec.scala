package graft.etl

import graft.SparkSpec
import org.apache.spark.sql.types.{DoubleType, IntegerType}

class IngestSpec extends SparkSpec {
  import spark.implicits._

  test("prepare: CSV scan → inner join on id_annonce → cast → parquet") {
    val dir = tmpDir("ingest")
    // X has 4 listings, y has labels for 3 → inner join keeps 3 (quirk Q5)
    Seq(
      "id_annonce,property_type,size,nb_rooms",
      "1,maison,100.5,4", "2,appartement,55.0,2",
      "3,propriété,300.25,9", "4,maison,80.0,3")
      .toDF("v").coalesce(1).write.text(s"$dir/x_csv")
    Seq("id_annonce,price", "1,250000.0", "2,180000.5", "3,890000.0")
      .toDF("v").coalesce(1).write.text(s"$dir/y_csv")

    val (nx, ny, nj) = Ingest.prepare(spark,
      s"$dir/x_csv", s"$dir/y_csv", s"$dir/listings")
    (nx, ny, nj) shouldBe ((4L, 3L, 3L))

    val out = spark.read.parquet(s"$dir/listings")
    out.schema("id_annonce").dataType shouldBe IntegerType
    out.schema("size").dataType shouldBe DoubleType
    out.schema("price").dataType shouldBe DoubleType
    out.columns should contain allOf ("property_type", "nb_rooms")
    out.filter($"id_annonce" === 2).head().getAs[Double]("price") shouldBe 180000.5
  }

  test("castCanonical only projects known canonical columns") {
    val df = Seq((1, "maison", "junk")).toDF("id_annonce", "property_type", "extra")
    val out = Ingest.castCanonical(df)
    out.columns should contain theSameElementsAs Seq("id_annonce", "property_type")
  }
}
