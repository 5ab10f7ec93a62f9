package graft.queries

import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table — the
  * training-data-pipeline surface (language-ID heuristic, quality scoring,
  * token counting, document fingerprinting). All pure `functions._` /
  * higher-order-function expressions: codegen-friendly, no UDFs, fully
  * parallel per-row with zero shuffle (the only shuffles below are final
  * small aggregations).
  *
  * Every query here is deterministic and ANSI-expressible → DuckDB oracle.
  */
object TextQueries extends QueryModule {

  override def all: Seq[GraftQuery] = Seq(

    // Per-document quality statistics: token counts, mean token length,
    // stopword ratio, lexical diversity. At 100 TB this is a pure map —
    // no shuffle, whole-stage codegen, columns pruned to (doc_id, text).
    GraftQuery(
      "text_stats",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
                  expr("split(trim(text), '\\\\s+')").as("tk"),
                  length(col("text")).cast("long").as("len_chars"))
          .select(
            col("doc_id"),
            col("len_chars"),
            size(col("tk")).cast("long").as("n_tokens"),
            size(array_distinct(col("tk"))).cast("long").as("n_unique"),
            expr("round(aggregate(tk, 0L, (acc, x) -> acc + length(x)) / size(tk), 4)")
              .as("avg_token_len"),
            expr("round(size(filter(tk, x -> x IN ('the', 'a', 'of', 'and', 'to', 'in'))) / size(tk), 4)")
              .as("stopword_ratio")),
      Some("""SELECT doc_id,
        |  length(text) AS len_chars,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        |  len(list_distinct(regexp_split_to_array(trim(text), '\s+'))) AS n_unique,
        |  round(list_sum(list_transform(regexp_split_to_array(trim(text), '\s+'), x -> length(x)))
        |        / len(regexp_split_to_array(trim(text), '\s+')), 4) AS avg_token_len,
        |  round(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                        x -> x IN ('the', 'a', 'of', 'and', 'to', 'in')))
        |        / len(regexp_split_to_array(trim(text), '\s+')), 4) AS stopword_ratio
        |FROM documents""".stripMargin)),

    // Language-ID by stopword-marker scoring — the classic n-gram/marker
    // heuristic; deterministic priority order breaks score ties. (The
    // testdata's `lang` label is synthetic — same vocabulary for all five
    // values — so this checks the operator, not classifier accuracy.)
    GraftQuery(
      "text_lang_id",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), expr("split(trim(text), '\\\\s+')").as("tk"))
          .select(
            col("doc_id"),
            expr("size(filter(tk, x -> x IN ('the', 'a', 'of', 'and', 'to', 'in')))")
              .cast("long").as("score_en"),
            expr("size(filter(tk, x -> x IN ('der', 'die', 'das', 'und', 'ist')))")
              .cast("long").as("score_de"),
            expr("size(filter(tk, x -> x IN ('le', 'la', 'les', 'et', 'est')))")
              .cast("long").as("score_fr"),
            expr("size(filter(tk, x -> x IN ('el', 'los', 'las', 'es', 'y')))")
              .cast("long").as("score_es"))
          .withColumn("lang_pred",
            when(col("score_en") >= greatest(col("score_de"), col("score_fr"),
                                             col("score_es")) &&
                 col("score_en") > 0, "en")
              .when(col("score_de") >= greatest(col("score_fr"), col("score_es")) &&
                    col("score_de") > 0, "de")
              .when(col("score_fr") >= col("score_es") && col("score_fr") > 0, "fr")
              .when(col("score_es") > 0, "es")
              .otherwise("und")),
      Some("""WITH sc AS (
        |  SELECT doc_id,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |        x -> x IN ('the', 'a', 'of', 'and', 'to', 'in'))) AS score_en,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |        x -> x IN ('der', 'die', 'das', 'und', 'ist'))) AS score_de,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |        x -> x IN ('le', 'la', 'les', 'et', 'est'))) AS score_fr,
        |    len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |        x -> x IN ('el', 'los', 'las', 'es', 'y'))) AS score_es
        |  FROM documents)
        |SELECT doc_id, score_en, score_de, score_fr, score_es,
        |  CASE
        |    WHEN score_en >= greatest(score_de, score_fr, score_es)
        |         AND score_en > 0 THEN 'en'
        |    WHEN score_de >= greatest(score_fr, score_es) AND score_de > 0 THEN 'de'
        |    WHEN score_fr >= score_es AND score_fr > 0 THEN 'fr'
        |    WHEN score_es > 0 THEN 'es'
        |    ELSE 'und' END AS lang_pred
        |FROM sc""".stripMargin)),

    // Token counting: whitespace tokens + a BPE-ish regex tokenizer
    // (letter runs | digit runs | single punctuation).
    GraftQuery(
      "text_token_count",
      (s, dir) =>
        t(s, dir, "documents")
          .select(
            col("doc_id"),
            expr("size(split(trim(text), '\\\\s+'))").cast("long")
              .as("n_ws_tokens"),
            expr("size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\\\\s]', 0))")
              .cast("long").as("n_bpe_tokens")),
      Some("""SELECT doc_id,
        |  len(regexp_split_to_array(trim(text), '\s+')) AS n_ws_tokens,
        |  len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpe_tokens
        |FROM documents""".stripMargin)),

    // Document fingerprinting: md5 over whitespace-normalized text, plus a
    // head fingerprint (first 64 normalized chars) for prefix-block dedup.
    GraftQuery(
      "text_fingerprint",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"),
                  expr("trim(regexp_replace(lower(text), '\\\\s+', ' '))")
                    .as("norm"))
          .select(col("doc_id"),
                  md5(col("norm")).as("fp_md5"),
                  md5(substring(col("norm"), 1, 64)).as("fp_head_md5"),
                  length(col("norm")).cast("long").as("norm_len")),
      Some("""WITH n AS (SELECT doc_id,
        |    trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm
        |  FROM documents)
        |SELECT doc_id, md5(norm) AS fp_md5,
        |  md5(substring(norm, 1, 64)) AS fp_head_md5,
        |  length(norm) AS norm_len
        |FROM n""".stripMargin)),
  )
}
