"""M0/M1 tests: type matrix, DDL parser vs the reference regression corpus,
Spark schema application, and end-to-end execution of migrated views."""

from __future__ import annotations

import glob

import pytest
from pyspark.sql import Row

from sqlserver2pgsql_spark.catalog.types import convert_type, numeric_to_int
from sqlserver2pgsql_spark.catalog.identifiers import camel_to_snake, normalize_identifier
from sqlserver2pgsql_spark.ddl import parse_dump, parse_text
from sqlserver2pgsql_spark.ddl.emit_pg import emit_after, emit_before, emit_unsure
from sqlserver2pgsql_spark.ddl.parser import DdlParseError, ParserOptions
from sqlserver2pgsql_spark.ddl.spark_schema import (
    register_views,
    to_struct_type,
    validation_plan,
    with_computed_columns,
)

CORPUS = sorted(
    glob.glob("/root/reference/regression/*.sql")
    + glob.glob("/root/reference/regression/basic_test/*.sql")
)


# --- type matrix -------------------------------------------------------------


def test_type_matrix_basics():
    assert convert_type("int").spark_type == "int"
    assert convert_type("tinyint").spark_type == "smallint"
    assert convert_type("numeric", "(10, 0)").spark_type == "decimal(10,0)"
    assert convert_type("numeric", "(10, 0)", numeric_as_int=True).spark_type == "bigint"
    assert convert_type("numeric", "(21, 7)", numeric_as_int=True).spark_type == "decimal(21,7)"
    assert convert_type("money").spark_type == "decimal(19,4)"
    assert convert_type("bit").spark_type == "boolean"
    assert convert_type("rowversion").spark_type == "binary"
    assert convert_type("datetimeoffset").spark_type == "timestamp"
    assert convert_type("uniqueidentifier").needs_lower_compare
    assert convert_type("nvarchar", "(max)").is_lob
    assert convert_type("varchar", "(35)", column="bic").check_exprs == ["length(bic) <= 35"]
    with pytest.raises(ValueError):
        convert_type("no_such_type")


def test_numeric_to_int_boundaries():
    assert numeric_to_int(4) == "smallint"
    assert numeric_to_int(9) == "int"
    assert numeric_to_int(18) == "bigint"
    assert numeric_to_int(19) == "decimal(19,0)"


def test_identifier_pipeline():
    assert normalize_identifier("DealerCode") == "dealercode"
    assert normalize_identifier("DealerCode", "snake") == "dealer_code"
    assert camel_to_snake("SalesDistrictCode") == "sales_district_code"
    warnings: list[str] = []
    normalize_identifier("x" * 70, warnings=warnings)
    assert warnings


# --- corpus parsing (the reference's own regression inputs) ------------------


@pytest.mark.parametrize("path", CORPUS, ids=[p.split("/")[-1] for p in CORPUS])
def test_corpus_parses(path):
    cat = parse_dump(path)
    assert sum(len(s.tables) for s in cat.schemas.values()) > 0


def test_reg_tests_catalog_fidelity():
    cat = parse_dump("/root/reference/regression/reg_tests.sql")
    tt = cat.schemas["public"].tables["testtable"]
    assert [c.name for c in tt.ordered_columns()][:2] == ["num_folio", "folio_id"]
    assert tt.primary_key.cols == ["num_folio"]
    assert len(tt.checks) == 3 and not any(c.unsure for c in tt.checks)
    assert tt.foreign_keys[0].ref_table == "adjudicaciones"
    assert tt.indexes["idx_folio_id"].where_sql is not None  # partial index

    dp = cat.schemas["public"].tables["dealer_profile"]
    defaults = {c.name: c.default.sql for c in dp.ordered_columns() if c.default}
    assert defaults["modifiedby"] == "current_user()"
    assert defaults["modifieddate"] == "current_timestamp()"

    gc = cat.schemas["public"].tables["generatedcolumns"]
    computed = {c.name: c.computed_expr for c in gc.ordered_columns() if c.computed_expr}
    # T-SQL + over varchar columns = concat (catalog-typed rewrite)
    assert computed["sum1"] == "val1||val2"
    assert {"edb", "etl", "reflex", "public"} <= set(cat.schemas)
    assert cat.schemas["reflex"].tables["hfmnltp"].indexes["hfmnltl2"].disabled


def test_identity_and_sequences():
    cat = parse_dump("/root/reference/regression/issue_112.sql")
    t = cat.schemas["public"].tables["afelementattributecategory"]
    rid = t.columns["rid"]
    assert rid.identity.start == -1 and rid.identity.step == -1
    seqs = cat.schemas["public"].sequences
    assert seqs["sd_rid_seq"].start == 1000


def test_numeric_as_int_option():
    cat = parse_dump(
        "/root/reference/regression/issue_59.sql",
        ParserOptions(numeric_as_int=True),
    )
    acc = cat.schemas["public"].tables["account"]
    assert acc.columns["version"].spark_type == "bigint"  # numeric(10,0)
    assert acc.columns["deleted"].spark_type == "smallint"  # numeric(1,0)
    assert acc.columns["daily_limit"].spark_type == "decimal(21,7)"  # scale≠0 stays
    idx = acc.indexes["idx_account_bic_iban"]
    assert idx.include == ["back_office_account_number", "bank_account_number"]


def test_drop_rowversion_option():
    cat = parse_dump(
        "/root/reference/regression/reg_tests.sql", ParserOptions(drop_rowversion=True)
    )
    t = cat.schemas["edb"].tables["rowversiontable"]
    assert "ver_col" not in t.columns  # (:1437-1443)


def test_unknown_statement_dies():
    with pytest.raises(DdlParseError):
        parse_text("FROBNICATE THE DATABASE")


def test_extended_properties_comments():
    cat = parse_dump("/root/reference/regression/issue_59.sql")
    acc = cat.schemas["public"].tables["account"]
    assert acc.columns["id"].comment == "ONEBANK.ACCOUNT.ID"


# --- Spark application -------------------------------------------------------


def test_struct_type_and_validation_plan():
    cat = parse_dump("/root/reference/regression/issue_59.sql")
    acc = cat.schemas["public"].tables["account"]
    st = to_struct_type(acc)
    assert st["version"].dataType.typeName() == "decimal"
    assert not st["id"].nullable
    kinds = [k for k, _, _ in validation_plan(acc)]
    assert "pk" in kinds and "check" in kinds


def test_views_execute_on_spark(spark, duck):
    """M5 end-to-end: parse the views corpus, materialize base tables from
    the catalog StructTypes, register translated views, and cross-check V2
    against DuckDB running the equivalent ANSI SQL on the same rows."""
    import pandas as pd

    from tests.conftest import normalize

    cat = parse_dump("/root/reference/regression/basic_test/views.sql")
    pub = cat.schemas["public"]
    rows = [
        Row(c1="k1", c2="a", c3=1),
        Row(c1="k2", c2="b", c3=2),
        Row(c1="k3", c2=None, c3=3),
    ]
    for t in ("t3309", "t3317"):
        spark.createDataFrame(rows, schema=to_struct_type(pub.tables[t])).createOrReplaceTempView(t)
    import datetime

    spark.createDataFrame(
        [Row(c1=datetime.date(2020, 1, 1), c2=datetime.datetime(2020, 1, 1), c3=1)],
        schema=to_struct_type(pub.tables["t3352"]),
    ).createOrReplaceTempView("t3352")

    registered = register_views(spark, cat)
    assert registered == ["v1", "v2", "v3", "v4", "v5", "v6"]

    # k3 has NULL c2 → NULL=NULL is not TRUE → the equi-join drops it
    assert spark.sql("SELECT * FROM v1").count() == 2
    assert spark.sql("SELECT * FROM v3").collect()[0][0] == 2
    # V5 keeps its body aliases (stale header list, see register_views)
    v5 = spark.sql("SELECT * FROM v5 ORDER BY c1").collect()
    assert v5[0]["C3"] == "k1isnull("  # literal containing 'isnull(' survives

    got = spark.sql("SELECT c1, c2, c3, e0, e1 FROM v2").toPandas()
    exp = duck.execute(
        """
        WITH t(c1, c2, c3) AS (VALUES ('k1','a',1), ('k2','b',2), ('k3',NULL,3))
        SELECT b1.c1 || '|' || b2.c1 || '|' || b2.c2          AS c1,
               CAST(b1.c2 AS VARCHAR)                          AS c2,
               b1.c3 + coalesce(b2.c3, 0)                      AS c3,
               -- explicit round: DuckDB truncates decimal→decimal downscale
               -- casts where Spark rounds HALF_UP
               CAST(round(b1.c3 * 1.023156, 4) AS DECIMAL(6,4)) AS e0,
               CAST(b2.c3 AS INT)                              AS e1
        FROM t b1 JOIN t b2 ON b1.c1 = b2.c1 AND b1.c2 = b2.c2
        """
    ).fetchdf()
    pd.testing.assert_frame_equal(normalize(got), normalize(exp), check_dtype=False)


def test_computed_columns_projection(spark):
    cat = parse_dump("/root/reference/regression/reg_tests.sql")
    gc = cat.schemas["public"].tables["generatedcolumns"]
    df = spark.createDataFrame(
        [Row(val1="a", val2="b", val3="c")], schema=to_struct_type(gc)
    )
    out = with_computed_columns(df, gc).collect()[0]
    assert out.sum1 == "ab" and out.sum4 == "abc"


# --- PG DDL emission ---------------------------------------------------------


def test_emit_pg_scripts_and_duckdb_swallows_before(duck):
    cat = parse_dump("/root/reference/regression/issue_59.sql")
    before, after, unsure = emit_before(cat), emit_after(cat), emit_unsure(cat)
    assert 'CREATE TABLE "public"."account"' in before
    assert '"version" numeric(10,0)' in before
    assert "PRIMARY KEY" in after
    assert "INCLUDE" in after
    assert "WHERE" in unsure and "CHECK" in unsure
    # reference test layer 3 analog: a PG-dialect engine can swallow `before`
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE SCHEMA IF NOT EXISTS public")  # implicit in PG, not DuckDB
    for stmt in before.split(";"):
        stmt = "\n".join(
            line for line in stmt.splitlines() if not line.strip().startswith("\\")
        ).strip()
        if stmt and not stmt.startswith("--"):
            con.execute(stmt)
    assert con.execute("SELECT count(*) FROM public.account").fetchone()[0] == 0


def test_validate_constraints_modes_and_identity_column():
    from sqlserver2pgsql_spark.ddl.emit_pg import EmitOptions

    dump = """
CREATE TABLE [dbo].[parent] (
  [id] int IDENTITY(1000,2) NOT NULL,
  [code] char(4) NULL,
  [opens_at] time NULL,
  CONSTRAINT [pk_parent] PRIMARY KEY ([id])
)
GO
CREATE TABLE [dbo].[child] (
  [id] int NOT NULL,
  [parent_id] int NULL,
  CONSTRAINT [pk_child] PRIMARY KEY ([id]),
  CONSTRAINT [fk_child_parent] FOREIGN KEY ([parent_id]) REFERENCES [dbo].[parent] ([id])
)
GO
"""
    cat = parse_text(dump)

    # default: plain FK, sequence in before, no VALIDATE statements
    before = emit_before(cat)
    after = emit_after(cat)
    unsure = emit_unsure(cat)
    assert "CREATE SEQUENCE" in before and "START WITH 1000" in before
    assert '"fk_child_parent" FOREIGN KEY' in after and "NOT VALID" not in after
    assert "VALIDATE CONSTRAINT" not in unsure
    # char(n)/time keep their PG types (reference %types matrix)
    assert '"code" char(4)' in before
    assert '"opens_at" time' in before

    # validate_constraints=after: NOT VALID FK + VALIDATE in unsure (:2950-2959)
    opts = EmitOptions(validate_constraints="after")
    after_nv = emit_after(cat, opts)
    unsure_nv = emit_unsure(cat, opts)
    assert '("id") NOT VALID;' in after_nv
    assert 'VALIDATE CONSTRAINT "fk_child_parent";' in unsure_nv

    # validate_constraints=no: NOT VALID, never validated
    opts_no = EmitOptions(validate_constraints="no")
    assert "NOT VALID" in emit_after(cat, opts_no)
    assert "VALIDATE CONSTRAINT" not in emit_unsure(cat, opts_no)

    # use_identity_column: no sequence; GENERATED ALWAYS AS IDENTITY (:2722-2744)
    opts_id = EmitOptions(use_identity_column=True)
    before_id = emit_before(cat, opts_id)
    after_id = emit_after(cat, opts_id)
    assert "CREATE SEQUENCE" not in before_id
    assert (
        'ALTER TABLE "public"."parent" ALTER COLUMN "id" '
        "ADD GENERATED ALWAYS AS IDENTITY ( START WITH 1000 INCREMENT BY 2 );"
        in after_id
    )


def test_sequence_default_wiring_and_trigger_section():
    """Sequence mode wires SET DEFAULT nextval (reference :1449-1460); a
    catalog carrying triggers emits the function + CREATE TRIGGER section at
    the end of the unsure script (reference :3122-3161)."""
    from sqlserver2pgsql_spark.catalog.model import Trigger, TriggerFunction
    from sqlserver2pgsql_spark.ddl.emit_pg import EmitOptions

    dump = """
CREATE TABLE [dbo].[parent] (
  [id] int IDENTITY(1000,2) NOT NULL,
  CONSTRAINT [pk_parent] PRIMARY KEY ([id])
)
GO
"""
    cat = parse_text(dump)
    after = emit_after(cat)
    seq_name = next(iter(cat.schemas["public"].sequences))
    assert (
        f'ALTER TABLE "public"."parent" ALTER COLUMN "id" '
        f"SET DEFAULT nextval('public.{seq_name}');" in after
    )
    # identity mode must NOT also wire nextval
    assert "nextval" not in emit_after(cat, EmitOptions(use_identity_column=True))

    sch = cat.schemas["public"]
    sch.trig_functions["audit_fn"] = TriggerFunction(
        name="audit_fn", body="BEGIN RETURN NEW; END;"
    )
    sch.tables["parent"].triggers.append(
        Trigger(
            name="trg_audit",
            events="AFTER INSERT OR UPDATE",
            when="FOR EACH ROW",
            function="audit_fn",
        )
    )
    unsure = emit_unsure(cat)
    fn_pos = unsure.find(
        'CREATE FUNCTION "public"."audit_fn"() RETURNS trigger LANGUAGE plpgsql'
    )
    trg_pos = unsure.find(
        'CREATE TRIGGER "trg_audit" AFTER INSERT OR UPDATE ON "public"."parent" '
        'FOR EACH ROW EXECUTE PROCEDURE "public"."audit_fn"();'
    )
    assert fn_pos != -1 and trg_pos != -1 and fn_pos < trg_pos
    assert "$def$\nBEGIN RETURN NEW; END;\n$def$;" in unsure
