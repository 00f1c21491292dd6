package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** C4-style line-level exact deduplication.
  *
  * C4 removed every duplicated three-sentence span corpus-wide keeping
  * one occurrence; the general form is: segment each document into
  * units, count each unit's global frequency, drop occurrences of
  * units repeated >= minCount times (optionally keeping the first
  * occurrence as canonical), and reassemble the surviving units in
  * document order.
  *
  * Scale shape: one hash-aggregation shuffle on the unit string (with
  * map-side partial counts), one equi-join of occurrences against
  * unit frequencies (AQE-skew-safe; the unit key is high-cardinality
  * by construction), one id-keyed shuffle to reassemble documents.
  * No window over the whole corpus, no broadcast of anything
  * corpus-sized. The "keep first occurrence" winner is chosen inside
  * the SAME count aggregation (`min(position)`), not a second window
  * pass — at 100 TB that saves an entire sort-shuffle.
  */
object LineDedup {

  /** Position encoding used to pick the canonical first occurrence:
    * `doc_id * PosBase + idx`, totally ordered across the corpus.
    * Requires idx < PosBase (a million segments per document) AND
    * 0 <= doc_id <= MaxId — both raise loudly if violated, because a
    * silent Long overflow would pick a WRONG canonical winner (10^6 is
    * not invertible mod 2^64, so wrapped positions can collide).
    * Corpora with 64-bit hash ids must re-key (dense_rank or similar)
    * before line dedup. */
  val PosBase = 1000000L
  val MaxId: Long = Long.MaxValue / PosBase - 1

  /** Newline segmentation for real corpora. */
  def lines(text: Column): Column =
    filter(split(text, "\n"), x => trim(x) =!= "")

  /** Fixed-width word-window segmentation (non-overlapping `width`-word
    * chunks) for corpora without line structure — the fixture
    * documents are single-line word streams. */
  def wordChunks(text: Column, width: Int): Column = {
    require(width > 0, s"chunk width must be positive, got $width")
    val w = TextAnalysis.tokens(text)
    val nChunks = ceil(size(w).cast("double") / width).cast("int")
    when(size(w) > 0,
      transform(sequence(lit(0), nChunks - 1),
        i => concat_ws(" ", slice(w, i * width + 1, lit(width)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Deduplicate `segCol` (an array of unit strings per document)
    * across the whole corpus.
    *
    * Output: (idCol, n_units, n_dropped, kept_text) — `kept_text` is
    * the surviving units re-joined with a single space in original
    * document order ('' when every unit was dropped).
    *
    * @param minCount  drop occurrences of units appearing >= minCount
    *                  times corpus-wide
    * @param keepFirst when true, the globally first occurrence (by
    *                  (doc_id, idx)) of a dropped unit survives as the
    *                  canonical copy — C4's semantics; when false all
    *                  occurrences are dropped (strict hygiene mode)
    */
  def dedup(df: DataFrame, segCol: Column, minCount: Long,
            keepFirst: Boolean = true, idCol: String = "doc_id")
      : DataFrame = {
    val id = col(idCol)
    val units = df.select(id, posexplode(segCol).as(Seq("idx", "unit")))
      .withColumn("pos",
        when(col("idx") < PosBase && id.between(0L, MaxId),
          id * PosBase + col("idx"))
          .otherwise(raise_error(lit(
            s"LineDedup: idx >= PosBase=$PosBase or id outside [0, $MaxId]" +
              " — position encoding would overflow; re-key ids first"))))

    // global unit frequency + canonical-first winner in ONE aggregation
    val freq = units.groupBy(col("unit"))
      .agg(count(lit(1)).as("n"), min(col("pos")).as("keeper_pos"))

    val keepCond =
      if (keepFirst) col("n") < minCount || col("pos") === col("keeper_pos")
      else col("n") < minCount

    val tagged = units.join(freq, Seq("unit"))
    val perDoc = tagged.groupBy(id)
      .agg(
        count(lit(1)).cast("long").as("n_units"),
        sum(when(keepCond, 0L).otherwise(1L)).cast("long").as("n_dropped"),
        concat_ws(" ",
          transform(
            array_sort(collect_list(when(keepCond,
              struct(col("idx"), col("unit"))))),
            x => x.getField("unit"))).as("kept_text"))

    // documents whose every unit was dropped still appear (left join)
    df.select(id).distinct()
      .join(perDoc, Seq(idCol), "left_outer")
      .select(id,
        coalesce(col("n_units"), lit(0L)).as("n_units"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"),
        coalesce(col("kept_text"), lit("")).as("kept_text"))
  }

  /** Intra-document unit dedup: drop repeated occurrences of a unit
    * WITHIN each document, keeping the first — the boilerplate cleaner
    * (repeated nav menus, duplicated disclaimers, copy-paste stutter)
    * that runs BEFORE corpus-level [[dedup]]. Output schema matches
    * [[dedup]]: (idCol, n_units, n_dropped, kept_text).
    *
    * Purely per-row: the corpus never shuffles (corpus-level dedup
    * needs three exchanges; this needs zero — it composes into any
    * scan as a narrow projection). The per-row pass is a deterministic
    * O(units) UDF with a seen-set; the codegen'd higher-order-function
    * alternative (filter + array_position) is O(units²) per doc, which
    * the r3 `t_repetition` incident showed is exactly the sf-blind
    * trap to avoid on long documents. */
  def dedupWithinDoc(df: DataFrame, segCol: Column,
                     idCol: String = "doc_id"): DataFrame = {
    val keepFirsts = udf { (units: Seq[String]) =>
      if (units == null) (0L, 0L, "")
      else {
        val seen = scala.collection.mutable.HashSet.empty[String]
        val kept = units.filter(seen.add) // add returns false on repeat
        (units.length.toLong, (units.length - kept.length).toLong,
          kept.mkString(" "))
      }
    }
    df.select(col(idCol), keepFirsts(segCol).as("__r"))
      .select(col(idCol), col("__r._1").as("n_units"),
        col("__r._2").as("n_dropped"), col("__r._3").as("kept_text"))
  }
}
