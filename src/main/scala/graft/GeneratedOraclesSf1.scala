package graft

/** Tier-bound literal-pin oracles for the 10x (sf1) tier — the same
  * reproducibility-pin pattern as [[GeneratedOracles]] (each literal is
  * the engine's own output, bit-stable across fresh JVMs; search
  * QUALITY stays gated by the per-family recall/bit-equality specs),
  * but generated AT the sf1 tier by `tools/gen_pins.py` from a
  * `graft.Verify /tmp/graft_sf1` dump. Closes the r11 replay gap: the
  * sf0.01-generation VALUES pins bind only their generation tier, so
  * the whole-surface sf1 sweep had to skip them — with this overlay
  * (applied by Verify when it detects the sf1 tier by its exact
  * embeddings cardinality) the same hash gate replays them at 10x.
  *
  * The pins live in a gzipped tab-separated resource
  * (`name\tbase64(sql)`): the 10k-row ANN batch relations exceed the
  * JVM's 64 KB class-file string-constant limit, and base64 + gzip
  * keeps the artifact dependency-free to load. The sf1 tier itself is
  * a DETERMINISTIC pure-SQL derivation of the driver's sf0.1 parquet
  * (`tools/make_sf1.py` — no randomness), so the pins stay valid
  * across tier regenerations. Verify keys the overlay off the tier's
  * explicit `_GRAFT_TIER` marker file (written by the generator),
  * never off a coincidental row count.
  */
object GeneratedOraclesSf1 {

  lazy val sql: Map[String, String] = {
    val in = getClass.getResourceAsStream("/sf1_pins.tsv.gz")
    if (in == null) Map.empty
    else try {
      val gz = new java.util.zip.GZIPInputStream(in)
      val text = new String(gz.readAllBytes(),
        java.nio.charset.StandardCharsets.UTF_8)
      text.split("\n").iterator.filter(_.nonEmpty).map { line =>
        val Array(name, b64) = line.split("\t", 2)
        name -> new String(java.util.Base64.getDecoder.decode(b64),
          java.nio.charset.StandardCharsets.UTF_8)
      }.toMap
    } finally in.close()
  }
}
