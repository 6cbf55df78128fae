package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.pipeline.{Dedup, IvfAnn, PqAnn}

/** r16 footer-inference sweep: every persisted-index load now passes an
  * explicit schema (plan-only, no inference job). These tests pin the
  * CONTRACT that makes the optimization safe — the constructed schemas
  * describe the bytes actually on disk: loading with them returns the
  * same columns, types, and rows as the schemaless (inference) read. */
class SchemaLoadSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def shape(df: org.apache.spark.sql.DataFrame): Seq[(String, String)] =
    df.schema.fields.toSeq.map(f => (f.name, f.dataType.sql))

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"),
    (3L, "a completely different document about spark shuffles and joins"),
    (4L, "a completely different document about spark shuffles and skew"),
    (5L, "short text")).toDF("doc_id", "text")

  test("minhash index: explicit-schema load ≡ schemaless load") {
    val dir = Files.createTempDirectory("sls_mh").toString
    val (built, sigs) = Dedup.minhashIndexWithSigs(docs, "doc_id", "text",
      shingleWords = 2, numHashes = 8, bands = 4)
    Dedup.saveIndex(built, dir)
    sigs.unpersist()
    val plain = Dedup.loadIndex(spark, dir)
    val schemas = Dedup.indexSchemas(docs, "doc_id", "text",
      shingleWords = 2, numHashes = 8, bands = 4)
    val typed = Dedup.loadIndex(spark, dir, Some(schemas))
    assert(shape(typed.buckets).toSet === shape(plain.buckets).toSet)
    assert(shape(typed.shingles).toSet === shape(plain.shingles).toSet)
    assert(rows(typed.buckets.select("_band", "_bucket", "doc_id")) ===
      rows(plain.buckets.select("_band", "_bucket", "doc_id")))
    assert(rows(typed.shingles) === rows(plain.shingles))
    graft.util.Local.deleteRecursively(dir)
  }

  test("simhash index: explicit-schema load ≡ schemaless load") {
    val dir = Files.createTempDirectory("sls_sh").toString
    val (built, sigs) = Dedup.simhashIndexWithSigs(docs, "doc_id", "text",
      maxHamming = 2, shingleWords = 2)
    Dedup.saveSimhashIndex(built, dir)
    sigs.unpersist()
    val plain = Dedup.loadSimhashIndex(spark, dir)
    val schemas = Dedup.simhashIndexSchemas(docs, "doc_id", "text",
      maxHamming = 2, shingleWords = 2)
    val typed = Dedup.loadSimhashIndex(spark, dir, Some(schemas))
    assert(shape(typed.keys).toSet === shape(plain.keys).toSet)
    assert(shape(typed.shingles).toSet === shape(plain.shingles).toSet)
    assert(rows(typed.keys.select("_comb", "_v1", "_v2", "doc_id", "_sim")) ===
      rows(plain.keys.select("_comb", "_v1", "_v2", "doc_id", "_sim")))
    assert(rows(typed.shingles) === rows(plain.shingles))
    graft.util.Local.deleteRecursively(dir)
  }

  test("IVF index: explicit-schema load ≡ schemaless load") {
    val dir = Files.createTempDirectory("sls_ivf").toString
    val emb = (0L until 40L).map(i =>
      (i, Array.tabulate(4)(k => ((i % 5) + k * 0.1)))).toSeq
      .toDF("vec_id", "embedding")
    val built = IvfAnn.buildIndex(emb, "vec_id", "embedding", nlist = 3)
    IvfAnn.save(built, dir, nlist = 3)
    built.assigned.unpersist()
    val plain = IvfAnn.load(spark, dir)
    val typed = IvfAnn.load(spark, dir,
      Some(IvfAnn.indexSchemas(emb, "vec_id", "embedding")))
    assert(shape(typed.assigned).toSet === shape(plain.assigned).toSet)
    assert(shape(typed.centroids).toSet === shape(plain.centroids).toSet)
    assert(rows(typed.assigned.select("vec_id", "_cell")) ===
      rows(plain.assigned.select("vec_id", "_cell")))
    assert(rows(typed.centroids) === rows(plain.centroids))
    graft.util.Local.deleteRecursively(dir)
  }

  test("PQ index: static-schema load matches the persisted layout") {
    val dir = Files.createTempDirectory("sls_pq").toString
    val emb = (0L until 64L).map(i =>
      (i, Array.tabulate(8)(k => math.sin(i * 0.37 + k).toDouble))).toSeq
      .toDF("vec_id", "embedding")
    val ix = PqAnn.loadOrBuild(emb, "vec_id", "embedding",
      dim = 8, nlist = 2, m = 2, ksub = 4, dir = dir)
    // the loaded codes frame must agree with the encoder's own shape
    // (s5 unionByName's them) and with the schemaless read of the dir
    val enc = PqAnn.encodeNew(ix.model, emb.limit(0), "vec_id", "embedding")
    assert(shape(ix.codes).toSet === shape(enc).toSet)
    val plain = spark.read.parquet(s"$dir/codes")
    assert(shape(ix.codes).toSet === shape(plain).toSet)
    // hex the code bytes: Row.toString renders binary as an array ref
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("_cell"), hex(col("_code")).as("_code"))
    assert(rows(norm(ix.codes)) === rows(norm(plain)))
    graft.util.Local.deleteRecursively(dir)
  }
}
