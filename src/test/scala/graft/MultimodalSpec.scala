package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.fixture(spark, 30)

  test("fixture is deterministic and kinds partition the corpus") {
    val a = media.collect().map(m => (m.media_id, m.payload.toSeq))
    val b = Multimodal.fixture(spark, 30).collect().map(m => (m.media_id, m.payload.toSeq))
    assert(a.sameElements(b))
    assert(media.collect().map(_.kind).toSet == Set("image", "audio", "video"))
  }

  test("imageFeatures only processes images, with stable embeddings") {
    val feats = Multimodal.imageFeatures(media).collect()
    assert(feats.length == media.filter(_.kind == "image").count())
    feats.foreach { f =>
      assert(f.embedding.length == 64)
      assert(f.embedding.forall(x => x >= 0f && x <= 1f))
      assert(f.mean_byte > 0 && f.mean_byte < 255)
    }
    val again = Multimodal.imageFeatures(media).collect()
    assert(feats.map(_.embedding.toSeq).toSeq == again.map(_.embedding.toSeq).toSeq)
  }

  test("resize updates metadata and shrinks payloads; audio untouched") {
    val out = Multimodal.resize(media, 32, 32).collect()
    out.filter(_.kind != "audio").foreach { m =>
      assert(m.width == 32 && m.height == 32)
      assert(m.payload.nonEmpty)
    }
    val audioIn = media.filter(_.kind == "audio").collect().map(m => m.media_id -> m.payload.toSeq).toMap
    out.filter(_.kind == "audio").foreach(m => assert(m.payload.toSeq == audioIn(m.media_id)))
  }

  test("sampleFrames yields duration/everyMs frames per video") {
    val frames = Multimodal.sampleFrames(media, 500L)
    val counts = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    media.filter(_.kind == "video").collect().foreach { m =>
      assert(counts(m.media_id) == math.max(1, m.duration_ms / 500))
    }
    frames.collect().foreach(f => assert(f.payload.length <= 16))
  }

  test("declarative corpusMetadata matches the typed corpus row-for-row") {
    val declarative = Multimodal.corpusMetadata(spark, Sf)
    val typed = Multimodal.metadata(Multimodal.corpus(spark, Sf).toDF())
    // schemas first: a stringly row compare would miss type drift
    // (e.g. a lost .cast("int") turning width into a long). Compare
    // (name, type) only — nullability legitimately differs (the parquet
    // doc_id column is nullable, case-class primitives are not).
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.schema.fields.map(f => (f.name, f.dataType)).toSeq
    assert(shape(declarative) == shape(typed),
      s"metadata schemas diverged:\n${declarative.schema}\n${typed.schema}")
    assert(declarative.collect().map(_.toString).sorted.toSeq ==
      typed.collect().map(_.toString).sorted.toSeq,
      "the payload-free metadata formulas must stay in sync with mediaFor")
  }

  test("metadata-only query over parquet prunes the payload column") {
    val dir = Files.createTempDirectory("graft-media").toString + "/t"
    media.toDF().write.partitionBy("kind").parquet(dir)
    val meta = Multimodal.metadata(spark.read.parquet(dir))
    val plan = meta.queryExecution.executedPlan.toString
    assert(!plan.contains("payload"), s"payload must be pruned from the scan:\n$plan")
    assert(meta.filter(col("kind") === "image").count() == media.filter(_.kind == "image").count())
  }
}
