"""Stage-by-stage DuckDB parity for the checkpointed curation pipeline:
every SQL-expressible stage transform is re-derived in DuckDB from the
PREVIOUS stage's checkpoint and compared exactly (rows, columns, values).

The near-dup clustering feeding ``group_rep`` is the one non-SQL step
(banded LSH + packed cosine + CC — its exactness is pinned by the
`train_test_split` contract oracle and the linkage goldens); here the split
LABELING given group_rep, and everything else, is exact-twin-checked."""

import duckdb
import pandas as pd
import pytest

from polyfuzz_spark.functions import textstats as TS
from polyfuzz_spark.functions.curation import curation_verdict_sql
from polyfuzz_spark.functions.sampling import sample_oracle_predicate
from polyfuzz_spark.functions.scrub import pii_count_sql, scrub_text_sql
from polyfuzz_spark.plans.curation import CurationPipeline

from .test_curation_pipeline import CFG, _corpus

COLS = ('"doc_id", "repo", "path", "commit", "lang", "content_sha256", '
        '"entity_id"')


@pytest.fixture(scope="module")
def pipe(spark, tmp_path_factory):
    run_dir = tmp_path_factory.mktemp("curation_oracle")
    p = CurationPipeline(spark, str(run_dir), CFG)
    p.run(_corpus(spark))
    return p


@pytest.fixture(scope="module")
def con(pipe):
    c = duckdb.connect()
    for stage in pipe.STAGES:
        c.execute(
            f"CREATE VIEW {stage} AS "
            f"SELECT * FROM read_parquet('{pipe._path(stage)}/*.parquet')"
        )
    return c


def _cmp(con, sql, spark_df, key="doc_id"):
    exp = con.execute(sql).df()
    got = spark_df.toPandas()
    exp = exp[sorted(exp.columns)].sort_values(key).reset_index(drop=True)
    got = got[sorted(got.columns)].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(exp, got, check_dtype=False)


def test_scrub_stage_matches_duckdb(pipe, con):
    sql = f"""
SELECT {COLS},
       {scrub_text_sql('"content"')} AS content,
       {pii_count_sql('"content"', 'url')}
       + {pii_count_sql('"content"', 'email')}
       + {pii_count_sql('"content"', 'ip')} AS n_pii_scrubbed
FROM ingest
"""
    _cmp(con, sql, pipe.read("scrub"))


def test_strip_stage_matches_duckdb(pipe, con):
    sql = f"""
WITH l AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(ls)),
               i -> struct_pack(pos := i, line := ls[i]))) AS pl
           FROM (SELECT doc_id, string_split(content, chr(10)) AS ls
                 FROM scrub)),
flat AS (SELECT doc_id, pl.pos AS pos, pl.line AS line FROM l),
hot AS (SELECT line FROM flat
        WHERE length(trim(line)) >= {CFG.boiler_min_chars}
        GROUP BY line
        HAVING count(DISTINCT doc_id) >= {CFG.boiler_min_docs}),
marked AS (SELECT f.doc_id, f.pos, f.line, h.line IS NOT NULL AS hot
           FROM flat f LEFT JOIN hot h ON f.line = h.line),
stripped AS (
  SELECT doc_id,
         coalesce(string_agg(line, chr(10) ORDER BY pos)
                  FILTER (WHERE NOT hot), '') AS content,
         CAST(count(*) FILTER (WHERE hot) AS BIGINT) AS n_lines_removed
  FROM marked GROUP BY doc_id)
SELECT {COLS}, s."n_pii_scrubbed", t.content, t.n_lines_removed
FROM scrub s JOIN stripped t USING (doc_id)
"""
    _cmp(con, sql, pipe.read("strip"))


def test_verdicts_stage_matches_duckdb(pipe, con):
    sql = curation_verdict_sql(
        "strip",
        text_expr="content",
        id_expr="doc_id",
        min_tokens=CFG.min_tokens,
        min_alpha_milli=CFG.min_alpha_milli,
        max_dup_token_milli=CFG.max_dup_token_milli,
        max_top_bigram_milli=CFG.max_top_bigram_milli,
    )
    _cmp(con, sql, pipe.read("verdicts"))


def test_curated_stage_matches_duckdb(pipe, con):
    sql = """
SELECT s.* FROM strip s JOIN verdicts v USING (doc_id) WHERE v.keep
"""
    _cmp(con, sql, pipe.read("curated"))


def test_dedup_stage_matches_duckdb(pipe, con):
    # grouping by raw content equality == sha2(content) grouping
    sql = """
SELECT * FROM curated
WHERE doc_id IN (SELECT min(doc_id) FROM curated GROUP BY content)
"""
    _cmp(con, sql, pipe.read("dedup"))


def test_split_labels_match_duckdb(pipe, con):
    # the LABEL given group_rep is the shared md5 predicate (the cluster
    # rep itself comes from the non-SQL near-dup step, pinned elsewhere)
    pred = sample_oracle_predicate(
        '"group_rep"', str(CFG.train_frac), salt=CFG.split_salt
    )
    sql = f"""
SELECT doc_id,
       CASE WHEN {pred} THEN 'train' ELSE 'test' END AS split
FROM split
"""
    _cmp(con, sql, pipe.read("split").select("doc_id", "split"))
    # and the non-label columns are exactly the dedup stage plus group_rep
    _cmp(
        con,
        "SELECT doc_id, "
        "content_sha256 FROM dedup",
        pipe.read("split").select("doc_id", "content_sha256"),
    )


def test_final_stage_matches_duckdb(pipe, con):
    t = TS.tokens_sql("content")
    n = CFG.decontam_n
    sql = f"""
WITH toks AS (SELECT doc_id, split, {t} AS t FROM split),
grams AS (
  SELECT doc_id, split, unnest(list_distinct(list_transform(
      generate_series(1, len(t) - {n} + 1),
      i -> array_to_string(list_slice(t, i, i + {n} - 1), ' ')))) AS g
  FROM toks WHERE len(t) >= {n}),
tr AS (SELECT DISTINCT g FROM grams WHERE split = 'train'),
contaminated AS (
  SELECT DISTINCT doc_id FROM grams
  WHERE split = 'test' AND g IN (SELECT g FROM tr))
SELECT * FROM split
WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
"""
    _cmp(con, sql, pipe.read("final"))
