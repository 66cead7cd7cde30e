package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.{SketchBuilder, SketchConfig}

/**
 * K8: finch sketch interop — the reference's `From<MinHashKmers> for
 * KmerMinHash` (`/root/reference/src/from.rs:5-27`, feature-gated behind
 * `from-finch`). finch (public mash-compatible sketcher) serializes a
 * `MultiSketch` JSON: top-level sketching parameters plus one entry per
 * sketch with `hashes: [{hash, kmer, count, extra_count}]`.
 *
 * Conversion semantics replicated verbatim from `from.rs`:
 *  - `num`   = number of kmer-count entries (`values.len()`, from.rs:10)
 *  - `ksize` = length of the FIRST entry's kmer (from.rs:11 —
 *    `values.get(0).unwrap()` panics on an empty sketch; we raise), NOT
 *    the file's top-level `kmer` field
 *  - `seed`  = 42 hardcoded (from.rs:13) — the file's `hashSeed` is
 *    deliberately ignored, quirk kept
 *  - `max_hash` = 0 (bottom-k mode), `is_protein` = false,
 *    abundance tracked (from.rs:12-16)
 *  - hashes inserted via `add_many_with_abund` (from.rs:18-23): each
 *    (hash, count) is `count` repeated `add_hash` calls — duplicate
 *    hashes merge by summing counts; mins end unsigned-sorted. With
 *    `num = values.len()` nothing is evicted.
 *
 * Scale shape: one narrow projection per sketch row; the per-sketch
 * conversion is a bounded local loop (finch sketches are bottom-k, ≤
 * `sketchSize` entries). Not a hot path — interop ingestion.
 */
object FinchJson {

  private val kmerCountSchema = StructType(Seq(
    StructField("hash", DecimalType(20, 0)), // u64 in JSON
    StructField("kmer", StringType),
    StructField("count", LongType),
    StructField("extra_count", LongType)))

  private val sketchSchema = StructType(Seq(
    StructField("name", StringType),
    StructField("seqLength", LongType),
    StructField("numValidKmers", LongType),
    StructField("comment", StringType),
    StructField("hashes", ArrayType(kmerCountSchema))))

  /** finch `MultiSketch` (serialization layer of finch 0.1.x). */
  val multiSketchSchema: StructType = StructType(Seq(
    StructField("kmer", IntegerType),
    StructField("alphabet", StringType),
    StructField("preserveCase", BooleanType),
    StructField("canonical", BooleanType),
    StructField("sketchSize", IntegerType),
    StructField("hashType", StringType),
    StructField("hashBits", IntegerType),
    StructField("hashSeed", LongType),
    StructField("sketches", ArrayType(sketchSchema))))

  /** Parse + flatten: one row per finch sketch, file params carried. */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(multiSketchSchema).option("multiLine", true).json(path)
      .select(col("kmer").as("file_kmer"), col("sketchSize").as("file_sketch_size"),
        col("hashSeed").as("file_hash_seed"),
        explode(col("sketches")).as("sk"))
      .select(col("file_kmer"), col("file_sketch_size"), col("file_hash_seed"),
        col("sk.name").as("name"), col("sk.seqLength").as("seq_length"),
        col("sk.hashes").as("hashes"))

  /** Pure conversion kernel (from.rs:5-27 semantics, see scaladoc). */
  def convertEntries(entries: Seq[(Long, String, Long)]): (Int, Int, Array[Long], Array[Long]) = {
    require(entries.nonEmpty,
      "finch sketch with no hashes — From<MinHashKmers> panics (from.rs:11)")
    val ksize = entries.head._2.length
    val cfg = SketchConfig(num = entries.length, ksize = ksize, seed = 42L,
      trackAbundance = true)
    val b = new SketchBuilder(cfg)
    entries.foreach { case (h, _, c) => b.addHashWithCount(h, c) }
    (entries.length, ksize, b.result(), b.abundances())
  }

  private val convertUdf = udf((hashes: Seq[Row]) => {
    val entries = hashes.map(r =>
      (r.getDecimal(0).toBigInteger.longValue(), r.getString(1), r.getLong(2)))
    val (num, ksize, mins, abunds) = convertEntries(entries.toSeq)
    (num, ksize, mins, abunds)
  })

  /**
   * Deterministic finch-format demo fixture (the sandbox has no finch
   * binaries): k-21 kmers hashed with the engine's murmur3 kernel at
   * seed 42, one duplicate hash entry (exercises the count-merge path),
   * negative-longs-as-u64 hashes (exercises unsigned ordering), and a
   * decoy top-level `kmer`/`hashSeed` that the conversion must IGNORE
   * (from.rs:11,13 quirks). Idempotent write (content is a pure function
   * of nothing).
   */
  def writeDemoFixture(path: String): Unit = {
    val p = java.nio.file.Paths.get(path)
    // unconditional overwrite: content is deterministic, and a stale file
    // from an older build (different sketch set) must never shadow it.
    // Written to a sibling temp file + atomic move: the path is shared
    // by sm06/sm07 and read by the DuckDB oracle, so no reader may ever
    // observe a truncated in-place rewrite.
    java.nio.file.Files.createDirectories(p.getParent)
    def kmer(i: Int): String = {
      val bases = "ACGT"
      val sb = new StringBuilder
      var x = i * 2654435761L
      var j = 0
      while (j < 21) { sb += bases(((x >>> (2 * (j % 16))) & 3).toInt); x += i + 7; j += 1 }
      sb.toString
    }
    def entry(k: String, count: Long): String = {
      val h = java.lang.Long.toUnsignedString(graft.core.Murmur3.hash64(k, 42L))
      s"""{"hash": $h, "kmer": "$k", "count": $count, "extra_count": 0}"""
    }
    def sketch(name: String, entries: Seq[String]): String =
      s"""{"name": "$name", "seqLength": ${entries.length * 100}, "numValidKmers": ${entries.length * 80}, "comment": "", "hashes": [${entries.mkString(", ")}]}"""
    val s1 = sketch("finch_a", (1 to 8).map(i => entry(kmer(i), i.toLong)))
    // duplicate hash (kmer(11) twice): counts 5 and 2 must merge to 7;
    // zero-count entry (kmer(15)): counted in num but adds NO min
    // (from.rs's add_many_with_abund loops `count` times)
    val s2 = sketch("finch_b",
      (10 to 14).map(i => entry(kmer(i), 5L))
        :+ entry(kmer(11), 2L) :+ entry(kmer(15), 0L))
    // finch_c overlaps finch_b on kmers 12-14 (and on 15, which is
    // zero-count in b — so it must NOT count as common): the abundance-
    // weighted comparison surface (sm07) needs sketches that actually
    // share hashes with DIFFERENT counts
    val s3 = sketch("finch_c",
      (12 to 16).map(i => entry(kmer(i), (i - 9).toLong))
        ++ (17 to 20).map(i => entry(kmer(i), 2L)))
    // decoy kmer=31 and hashSeed=9999: conversion must emit ksize=21, seed=42
    val json =
      s"""{"kmer": 31, "alphabet": "ACGT", "preserveCase": false, "canonical": true,
         |"sketchSize": 1000, "hashType": "MurmurHash3_x64_128", "hashBits": 64,
         |"hashSeed": 9999, "sketches": [$s1, $s2, $s3]}""".stripMargin
    val tmp = java.nio.file.Files.createTempFile(p.getParent, ".finch_demo", ".tmp")
    java.nio.file.Files.writeString(tmp, json)
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }

  /** `From<MinHashKmers>`: flattened finch rows → KmerMinHash-shaped rows
    * (name, num, ksize, is_protein, seed, max_hash, mins, abunds). */
  def toMinHash(finch: DataFrame): DataFrame =
    finch
      .withColumn("mh", convertUdf(col("hashes")))
      .select(col("name"),
        col("mh._1").as("num"),
        col("mh._2").as("ksize"),
        lit(false).as("is_protein"),
        lit(42L).as("seed"), // from.rs:13 — file hashSeed ignored
        lit(0L).as("max_hash"),
        col("mh._3").as("mins"),
        col("mh._4").as("abunds"))
}
