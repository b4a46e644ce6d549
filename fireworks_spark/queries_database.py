"""Declared queries for the database mutation semantics (D7-D9, reference
fireworks/extensions/database.py:114-130 and database_test.py:100-228).

The queries exercise the pure join-rewrite forms (delete_rows/update_rows/
upsert_rows) so the driver's oracle can check them without writing anywhere;
the persistence path (Table delete/update/upsert with atomic swap) is
round-tripped in tests/test_database.py against a tmpdir copy.
"""

from __future__ import annotations

from fireworks_spark.scratch import scratch_dir as _scratch_dir

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fireworks_spark import database as db
from fireworks_spark.tables import table


def q60_delete_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE WHERE c_custkey IN (keys ending in 3 mod 10) — anti-join."""
    c = table(spark, sf_dir, "customer")
    keys = c.filter(F.col("c_custkey") % 10 == 3).select("c_custkey")
    return (
        db.delete_rows(c, "c_custkey", keys)
        .select("c_custkey")
        .orderBy("c_custkey")
    )


def q61_update_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UPDATE: zero the balance of every 7th customer; others untouched."""
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    batch = c.filter(F.col("c_custkey") % 7 == 0).withColumn(
        "c_acctbal", F.lit(0.0)
    )
    return (
        db.update_rows(c, batch, "c_custkey")
        .select("c_custkey", "c_acctbal")
        .orderBy("c_custkey")
    )


def q62_upsert_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE: replace the balance of every 100th customer AND insert shifted
    new keys — updated + inserted + untouched all present exactly once."""
    c = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    updates = c.filter(F.col("c_custkey") % 100 == 0).withColumn(
        "c_acctbal", F.lit(999.0)
    )
    inserts = (
        c.filter(F.col("c_custkey") % 100 == 50)
        .select(
            (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
            F.lit(111.0).alias("c_acctbal"),
        )
    )
    batch = updates.unionByName(inserts)
    return (
        db.upsert_rows(c, batch, "c_custkey")
        .select("c_custkey", "c_acctbal")
        .orderBy("c_custkey")
    )



def q114_feather_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The feather/Arrow-IPC connector end-to-end: customer written as a
    directory of per-partition feather files (io_formats.write_feather),
    read back file-parallel (read_feather), then aggregated — the oracle
    checks against the original parquet, so any loss or corruption in the
    custom source/sink surfaces as a value mismatch."""
    import shutil

    from fireworks_spark.io_formats import read_feather, write_feather

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    d = _scratch_dir(prefix="fw_feather_")
    try:
        write_feather(c.repartition(4), d)
        back = read_feather(spark, d)
        return (
            back.groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n"),
                (F.round(F.sum("c_acctbal"), 2) + F.lit(0.0)).alias("bal"),
                F.sum("c_custkey").alias("key_sum"),
            )
            .orderBy("c_mktsegment")
            # the temp dir must outlive the driver's lazy evaluation; the
            # read is materialized here so cleanup in finally is safe
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q116_stata_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Stata .dta connector end-to-end (Message.read/to 'stata',
    reference message.py:13-17): customer written as per-partition .dta
    parts (pandas' dependency-free Stata codec inside Arrow tasks), read
    back one file per task, aggregated against the original parquet — any
    codec loss (Stata downcasts small ints, strL strings) surfaces as a
    value mismatch."""
    import shutil

    from fireworks_spark.edge_formats import read_stata, write_stata

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    d = _scratch_dir(prefix="fw_stata_")
    try:
        write_stata(c.repartition(4), d)
        back = read_stata(spark, d)
        return (
            back.groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n"),
                (F.round(F.sum("c_acctbal"), 2) + F.lit(0.0)).alias("bal"),
                F.sum(F.col("c_custkey").cast("long")).alias("key_sum"),
            )
            .orderBy("c_mktsegment")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q133_excel_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dependency-free Excel .xlsx connector end-to-end (Message.read/
    to 'excel', reference message.py:13-17 — built on stdlib zipfile +
    OOXML templates, no openpyxl): customer written as per-partition
    .xlsx parts (inline strings, streamed rows), read back one file per
    task via iterparse, aggregated against the original parquet. Any
    cell-encoding loss (escaping, float text round-trip, null cells,
    integer typing) surfaces as a value mismatch."""
    import shutil

    from fireworks_spark.edge_formats import read_excel, write_excel

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    d = _scratch_dir(prefix="fw_xlsx_")
    try:
        write_excel(c.repartition(4), d)
        back = read_excel(spark, d)
        return (
            back.groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n"),
                (F.round(F.sum("c_acctbal"), 2) + F.lit(0.0)).alias("bal"),
                F.sum(F.col("c_custkey").cast("long")).alias("key_sum"),
            )
            .orderBy("c_mktsegment")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q141_msgpack_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The spec-implemented msgpack connector end-to-end (Message.read/to
    'msgpack', reference message.py:13 — pandas dropped its codec, so the
    connector ships its own): customer written as per-partition row-map
    streams, read back one file per task, aggregated against the original
    parquet. Any encode/decode loss (int widths, float64 bits, utf-8)
    surfaces as a value mismatch."""
    import shutil

    from fireworks_spark.edge_formats import read_msgpack, write_msgpack

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    d = _scratch_dir(prefix="fw_msgpack_")
    try:
        write_msgpack(c.repartition(4), d)
        back = read_msgpack(spark, d)
        return (
            back.groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n"),
                (F.round(F.sum("c_acctbal"), 2) + F.lit(0.0)).alias("bal"),
                F.sum(F.col("c_custkey").cast("long")).alias("key_sum"),
            )
            .orderBy("c_mktsegment")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q117_html_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HTML table connector end-to-end (Message.to 'html' + a
    distributed JVM-regexp reader in place of lxml-backed read_html):
    values seeded with all five escaped entities must survive the
    write→escape→parse→unescape loop bit-exact; the oracle recomputes the
    same synthetic column from the original parquet."""
    import shutil

    from fireworks_spark.edge_formats import read_html_tables, write_html

    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.concat(F.lit('<&>"\''), F.col("c_name")).alias("marked"),
    )
    d = _scratch_dir(prefix="fw_html_")
    try:
        write_html(c.repartition(4), d)
        back = read_html_tables(spark, d, schema="c_custkey bigint")
        return (
            back.groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("c_custkey").alias("key_sum"),
                F.sum(F.length("marked")).alias("marked_len"),
            )
            .orderBy("c_mktsegment")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q118_transaction_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-operation transaction (D11, reference database.py:33-43: one
    session spans delete+update+insert under a single commit): a temp copy
    of customer is mutated three ways inside ONE transaction; the composed
    join-rewrites materialize as ONE atomic swap at commit, and the oracle
    recomputes the final state from the original parquet — proving both the
    composition semantics and that the commit published everything."""
    import shutil

    c = table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    d = _scratch_dir(prefix="fw_txn_")
    path = f"{d}/t"
    try:
        c.write.parquet(path)
        t = db.Table(spark, path)
        with t.transaction() as tx:
            tx.delete(
                "c_custkey",
                c.filter(F.col("c_custkey") % 10 == 3).select("c_custkey"),
            )
            tx.update(
                c.filter(F.col("c_custkey") % 7 == 0).withColumn(
                    "c_acctbal", F.lit(0.0)
                ),
                "c_custkey",
            )
            tx.insert(
                c.filter(F.col("c_custkey") % 100 == 50).select(
                    (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
                    F.lit(111.0).alias("c_acctbal"),
                )
            )
        return (
            t.df()
            .select("c_custkey", "c_acctbal")
            .orderBy("c_custkey")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q121_fasta_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FASTA source end-to-end (BioSeqPipe, reference pipes.py:18-68):
    synthesize a deterministic FASTA corpus from documents (header =
    doc_id, sequence = upper md5 of the text), write it distributed as
    text parts, re-read with the lineSep='>' record scan, and return EVERY
    parsed record — the oracle re-derives the same 500 (id, sequence)
    rows from the raw table, so any parse drift (header split, sequence
    reassembly) is a value mismatch."""
    import shutil

    from fireworks_spark.sources import read_fasta

    d = table(spark, sf_dir, "documents")
    fa = d.select(
        F.concat(
            F.lit(">"),
            F.col("doc_id").cast("string"),
            F.lit(" synthetic doc\n"),
            F.upper(F.md5(F.col("text").cast("binary"))),
        ).alias("value")
    )
    tmp = _scratch_dir(prefix="fw_fasta_")
    path = f"{tmp}/fa"
    try:
        fa.repartition(8).write.text(path)
        back = read_fasta(spark, path)
        return (
            back.select(
                F.col("ids").cast("long").alias("doc_id"),
                F.col("sequences").alias("seq"),
            )
            .orderBy("doc_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q177_qual_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The QUAL source end-to-end (BioSeqPipe filetype='qual'): a
    deterministic quality-score corpus synthesized from documents (three
    integer scores derived from doc_id and the text length, split across
    TWO body lines so multi-line score reassembly is exercised), written
    as text parts, re-read with the '>' record scan. The oracle re-derives
    the scores arithmetically, so any parse drift (tokenization, int cast,
    line joining) is a value mismatch."""
    import shutil

    from fireworks_spark.sources import read_qual

    d = table(spark, sf_dir, "documents")
    qa = d.select(
        F.concat(
            F.lit(">"),
            F.col("doc_id").cast("string"),
            F.lit(" synthetic qual\n"),
            (F.col("doc_id") % 60).cast("string"),
            F.lit(" "),
            ((F.col("doc_id") * 7) % 60).cast("string"),
            F.lit("\n"),
            (F.length("text") % 60).cast("string"),
        ).alias("value")
    )
    tmp = _scratch_dir(prefix="fw_qual_")
    path = f"{tmp}/qv"
    try:
        qa.repartition(8).write.text(path)
        back = read_qual(spark, path)
        return (
            back.select(
                F.col("ids").cast("long").alias("doc_id"),
                F.array_join("qualities", " ").alias("scores"),
            )
            .orderBy("doc_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q178_pir_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NBRF/PIR source end-to-end (BioSeqPipe filetype='pir'): records
    synthesized from documents ('>P1;<id>', description line, md5 sequence
    terminated by '*'), written as text parts, re-read with the '>' record
    scan. The oracle re-derives id, type code, description and the
    '*'-stripped sequence, so header-semicolon splitting, the
    second-line-description rule and terminator stripping are all
    value-checked."""
    import shutil

    from fireworks_spark.sources import read_pir

    d = table(spark, sf_dir, "documents")
    pa = d.select(
        F.concat(
            F.lit(">P1;"),
            F.col("doc_id").cast("string"),
            F.lit("\nsynthetic protein "),
            F.col("doc_id").cast("string"),
            F.lit("\n"),
            F.upper(F.md5(F.col("text").cast("binary"))),
            F.lit("*"),
        ).alias("value")
    )
    tmp = _scratch_dir(prefix="fw_pir_")
    path = f"{tmp}/pv"
    try:
        pa.repartition(8).write.text(path)
        back = read_pir(spark, path)
        return (
            back.select(
                F.col("ids").cast("long").alias("doc_id"),
                F.col("pir_types").alias("ptype"),
                F.col("descriptions").alias("descr"),
                F.col("sequences").alias("seq"),
            )
            .orderBy("doc_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q179_phylip_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The strict-PHYLIP alignment source end-to-end (BioSeqPipe
    filetype='phylip'): a 32-site alignment synthesized from documents
    (taxon = doc_id in the strict 10-column name field, sites = upper md5
    of the text), written as one alignment file PER PARTITION by the
    distributed writer, re-read with the file-parallel interleaved parse.
    The oracle re-derives the same rows, so header counting, 10-column
    name slicing and site reassembly are all value-checked."""
    import shutil

    from fireworks_spark.sources import read_phylip, write_phylip

    d = table(spark, sf_dir, "documents")
    src = d.select(
        F.col("doc_id").cast("string").alias("ids"),
        F.upper(F.md5(F.col("text").cast("binary"))).alias("sequences"),
    )
    tmp = _scratch_dir(prefix="fw_phy_")
    path = f"{tmp}/phy"
    try:
        write_phylip(src.repartition(8), path)
        back = read_phylip(spark, path)
        return (
            back.select(
                F.col("ids").cast("long").alias("doc_id"),
                F.col("sequences").alias("seq"),
            )
            .orderBy("doc_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q180_clustal_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CLUSTAL alignment source end-to-end (BioSeqPipe
    filetype='clustal'): same synthesized alignment as q179 but written
    in interleaved CLUSTAL blocks (wrap=20, so each taxon's 32 sites span
    TWO blocks and chunk reassembly is exercised), one alignment file per
    partition, re-read with the file-parallel parse."""
    import shutil

    from fireworks_spark.sources import read_clustal, write_clustal

    d = table(spark, sf_dir, "documents")
    src = d.select(
        F.col("doc_id").cast("string").alias("ids"),
        F.upper(F.md5(F.col("text").cast("binary"))).alias("sequences"),
    )
    tmp = _scratch_dir(prefix="fw_aln_")
    path = f"{tmp}/aln"
    try:
        write_clustal(src.repartition(8), path, wrap=20)
        back = read_clustal(spark, path)
        return (
            back.select(
                F.col("ids").cast("long").alias("doc_id"),
                F.col("sequences").alias("seq"),
            )
            .orderBy("doc_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q182_stockholm_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Stockholm alignment source end-to-end (BioSeqPipe
    filetype='stockholm'): the q179 synthesized alignment written as
    Pfam-style Stockholm with per-sequence #=GS DE descriptions, one
    alignment file per partition, re-read with the file-parallel parse —
    descriptions value-checked alongside the sequences."""
    import shutil

    from fireworks_spark.sources import read_stockholm, write_stockholm

    d = table(spark, sf_dir, "documents")
    src = d.select(
        F.col("doc_id").cast("string").alias("ids"),
        F.upper(F.md5(F.col("text").cast("binary"))).alias("sequences"),
        F.concat(F.lit("doc "), F.col("doc_id").cast("string")).alias(
            "descriptions"
        ),
    )
    tmp = _scratch_dir(prefix="fw_sto_")
    path = f"{tmp}/sto"
    try:
        write_stockholm(src.repartition(8), path, desc_col="descriptions")
        back = read_stockholm(spark, path)
        return (
            back.select(
                F.col("ids").cast("long").alias("doc_id"),
                F.col("sequences").alias("seq"),
                F.col("descriptions").alias("descr"),
            )
            .orderBy("doc_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q183_nexus_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The NEXUS alignment source end-to-end (BioSeqPipe
    filetype='nexus'): the q179 synthesized alignment written as a NEXUS
    data block per partition (datatype=standard, equal-length contract),
    re-read with the comment-stripping, quote-aware file-parallel
    parse."""
    import shutil

    from fireworks_spark.sources import read_nexus, write_nexus

    d = table(spark, sf_dir, "documents")
    src = d.select(
        F.col("doc_id").cast("string").alias("ids"),
        F.upper(F.md5(F.col("text").cast("binary"))).alias("sequences"),
    )
    tmp = _scratch_dir(prefix="fw_nex_")
    path = f"{tmp}/nex"
    try:
        write_nexus(src.repartition(8), path)
        back = read_nexus(spark, path)
        return (
            back.select(
                F.col("ids").cast("long").alias("doc_id"),
                F.col("sequences").alias("seq"),
            )
            .orderBy("doc_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q185_ig_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The IntelliGenetics source end-to-end (BioSeqPipe filetype='ig'):
    records synthesized from documents (sequence = upper md5, which can
    legitimately end in the format's '1'/'2' topology digits — the
    writer-appended terminator keeps the roundtrip exact), ';' comment
    descriptions, one record stream per partition, re-read with the
    file-parallel parse."""
    import shutil

    from fireworks_spark.sources import read_ig, write_ig

    d = table(spark, sf_dir, "documents")
    src = d.select(
        F.col("doc_id").cast("string").alias("ids"),
        F.upper(F.md5(F.col("text").cast("binary"))).alias("sequences"),
        F.concat(F.lit("doc "), F.col("doc_id").cast("string")).alias(
            "descriptions"
        ),
    )
    tmp = _scratch_dir(prefix="fw_ig_")
    path = f"{tmp}/ig"
    try:
        write_ig(src.repartition(8), path, desc_col="descriptions")
        back = read_ig(spark, path)
        return (
            back.select(
                F.col("ids").cast("long").alias("doc_id"),
                F.col("sequences").alias("seq"),
                F.col("descriptions").alias("descr"),
            )
            .orderBy("doc_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q186_phd_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PHRED .phd source end-to-end (BioSeqPipe filetype='phd'):
    per-base quality scores synthesized as (doc_id + position) % 60,
    written as 'base quality position' rows, re-read with the
    file-parallel parse — both the sequence and every per-base score are
    value-checked (qualities space-joined for the oracle compare)."""
    import shutil

    from fireworks_spark.sources import read_phd, write_phd

    d = table(spark, sf_dir, "documents")
    src = d.select(
        F.col("doc_id").cast("string").alias("ids"),
        F.md5(F.col("text").cast("binary")).alias("sequences"),
        F.transform(
            F.sequence(F.lit(1), F.lit(32)),
            lambda x: ((F.col("doc_id") + x) % 60).cast("int"),
        ).alias("qualities"),
    )
    tmp = _scratch_dir(prefix="fw_phd_")
    path = f"{tmp}/phd"
    try:
        write_phd(src.repartition(8), path, qual_col="qualities")
        back = read_phd(spark, path)
        return (
            back.select(
                F.col("ids").cast("long").alias("doc_id"),
                F.col("sequences").alias("seq"),
                F.array_join("qualities", " ").alias("quals"),
            )
            .orderBy("doc_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q187_pdb_seqres_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PDB SEQRES source end-to-end (BioSeqPipe filetype=
    'pdb-seqres'): a 1-in-97 document subset (a PDB entry is ONE
    structure — one file per record, so the query bounds the file count)
    with hex md5 translated onto 16 amino-acid letters, written as
    single-chain entries with 4-digit idCodes, re-read by the
    fixed-column SEQRES parse; ids '<IDCODE>:A' map back to doc_id."""
    import shutil

    from fireworks_spark.sources import read_pdb_seqres, write_pdb_seqres

    # idCode is 4 chars by format definition: base-36-encode doc_id (good
    # to 36^4-1 = 1,679,615) rather than lpad a decimal string, which
    # silently TRUNCATES doc_ids >= 10000 to a WRONG id at sf >= 1. The
    # explicit bound keeps the query honest past that (filter, never
    # truncate), and the oracle applies the same bound.
    d = table(spark, sf_dir, "documents").filter(
        (F.col("doc_id") % 97 == 0) & (F.col("doc_id") < 36 ** 4)
    )
    src = d.select(
        F.lpad(
            F.conv(F.col("doc_id").cast("string"), 10, 36), 4, "0"
        ).alias("ids"),
        F.translate(
            F.upper(F.md5(F.col("text").cast("binary"))),
            "0123456789B",
            "GHIKLMNPQRS",
        ).alias("sequences"),
    )
    tmp = _scratch_dir(prefix="fw_pdb_")
    path = f"{tmp}/pdb"
    try:
        write_pdb_seqres(src.repartition(4), path)
        back = read_pdb_seqres(spark, path)
        return (
            back.select(
                F.conv(F.substring_index("ids", ":", 1), 36, 10)
                .cast("long")
                .alias("doc_id"),
                F.col("sequences").alias("seq"),
                F.col("descriptions").alias("descr"),
            )
            .orderBy("doc_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q188_nib_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UCSC .nib binary source end-to-end (BioSeqPipe filetype=
    'nib'): the same 1-in-97 subset (one sequence per FILE by format
    definition) with hex md5 translated onto the TCAGN/tcagn alphabet —
    exercising the soft-mask bit on every lowercase base — written as
    2-bases-per-byte binaries, re-read with the nibble decode."""
    import shutil

    from fireworks_spark.sources import read_nib, write_nib

    d = table(spark, sf_dir, "documents").filter(F.col("doc_id") % 97 == 0)
    src = d.select(
        F.col("doc_id").cast("string").alias("ids"),
        F.translate(
            F.md5(F.col("text").cast("binary")),
            "0123456789abcdef",
            "ACGTNacgtnACGTNa",
        ).alias("sequences"),
    )
    tmp = _scratch_dir(prefix="fw_nib_")
    path = f"{tmp}/nib"
    try:
        write_nib(src.repartition(4), path)
        back = read_nib(spark, path)
        return (
            back.select(
                F.col("ids").cast("long").alias("doc_id"),
                F.col("sequences").alias("seq"),
            )
            .orderBy("doc_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q189_seqxml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SeqXML source end-to-end (BioSeqPipe filetype='seqxml'):
    records synthesized from documents with XML-hostile descriptions
    ('<' '&' '\"' all present, exercising escape/unescape), one document
    per partition, re-read with the file-parallel XML parse."""
    import shutil

    from fireworks_spark.sources import read_seqxml, write_seqxml

    d = table(spark, sf_dir, "documents")
    src = d.select(
        F.col("doc_id").cast("string").alias("ids"),
        F.upper(F.md5(F.col("text").cast("binary"))).alias("sequences"),
        F.concat(
            F.lit('doc <'), F.col("doc_id").cast("string"),
            F.lit('> & "x"'),
        ).alias("descriptions"),
    )
    tmp = _scratch_dir(prefix="fw_sxml_")
    path = f"{tmp}/sxml"
    try:
        write_seqxml(src.repartition(8), path, desc_col="descriptions")
        back = read_seqxml(spark, path)
        return (
            back.select(
                F.col("ids").cast("long").alias("doc_id"),
                F.col("sequences").alias("seq"),
                F.col("descriptions").alias("descr"),
            )
            .orderBy("doc_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q190_twobit_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UCSC .2bit source end-to-end (BioSeqPipe filetype='twobit'):
    hex md5 translated onto the ACGTN/acgtn alphabet — every sequence
    carries N blocks, soft-mask blocks and masked-N overlap — written as
    one MULTI-sequence 2bit binary per partition (unlike nib's
    one-file-per-record cap, so the full table roundtrips), re-read with
    the 2-bit unpack + block overlay."""
    import shutil

    from fireworks_spark.sources import read_twobit, write_twobit

    d = table(spark, sf_dir, "documents")
    src = d.select(
        F.col("doc_id").cast("string").alias("ids"),
        F.translate(
            F.md5(F.col("text").cast("binary")),
            "0123456789abcdef",
            "ACGTNacgtnACGTNa",
        ).alias("sequences"),
    )
    tmp = _scratch_dir(prefix="fw_2bit_")
    path = f"{tmp}/tb"
    try:
        write_twobit(src.repartition(8), path)
        back = read_twobit(spark, path)
        return (
            back.select(
                F.col("ids").cast("long").alias("doc_id"),
                F.col("sequences").alias("seq"),
            )
            .orderBy("doc_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q191_uniprot_xml_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UniProtKB-XML source end-to-end (BioSeqPipe filetype=
    'uniprot-xml'): accessions, entry names, recommendedName
    descriptions (XML-hostile: '<' '&' '\"' present) and sequences
    synthesized from documents, one namespaced document per partition,
    re-read with the namespace-agnostic file-parallel parse."""
    import shutil

    from fireworks_spark.sources import read_uniprot_xml, write_uniprot_xml

    d = table(spark, sf_dir, "documents")
    src = d.select(
        F.concat(F.lit("P"), F.col("doc_id").cast("string")).alias("ids"),
        F.concat(F.lit("D"), F.col("doc_id").cast("string"),
                 F.lit("_HUMAN")).alias("names"),
        F.upper(F.md5(F.col("text").cast("binary"))).alias("sequences"),
        F.concat(
            F.lit('protein <'), F.col("doc_id").cast("string"),
            F.lit('> & "x"'),
        ).alias("descriptions"),
    )
    tmp = _scratch_dir(prefix="fw_up_")
    path = f"{tmp}/up"
    try:
        write_uniprot_xml(
            src.repartition(8), path, name_col="names",
            desc_col="descriptions",
        )
        back = read_uniprot_xml(spark, path)
        return (
            back.select(
                F.substring(F.col("ids"), 2, 100).cast("long").alias(
                    "doc_id"
                ),
                F.col("names").alias("nm"),
                F.col("sequences").alias("seq"),
                F.col("descriptions").alias("descr"),
            )
            .orderBy("doc_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q192_cif_seqres_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mmCIF declared-sequence source end-to-end (BioSeqPipe
    filetype='cif-seqres'): the FULL documents table — mmCIF chain ids
    are arbitrary strings, so each partition writes one multi-chain
    data block (no 4-char idCode subset like q187) — hex md5 translated
    onto 16 amino-acid letters, re-read via the CIF tokenizer +
    _entity_poly_seq x _struct_asym join."""
    import shutil

    from fireworks_spark.sources import read_cif_seqres, write_cif_seqres

    d = table(spark, sf_dir, "documents")
    src = d.select(
        F.concat(F.lit("D"), F.col("doc_id").cast("string")).alias("ids"),
        F.translate(
            F.upper(F.md5(F.col("text").cast("binary"))),
            "0123456789B",
            "GHIKLMNPQRS",
        ).alias("sequences"),
    )
    tmp = _scratch_dir(prefix="fw_cif_")
    path = f"{tmp}/cif"
    try:
        write_cif_seqres(src.repartition(8), path)
        back = read_cif_seqres(spark, path)
        return (
            back.select(
                F.substring(
                    F.substring_index("ids", ":", -1), 2, 100
                ).cast("long").alias("doc_id"),
                F.col("sequences").alias("seq"),
            )
            .orderBy("doc_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q122_fastq_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FASTQ source end-to-end: 4-line records synthesized from
    documents (sequence = upper md5, quality = the lowercase md5 — which
    puts hex digits AND letters in the quality line), written as text
    parts, re-read with the whole-file 4-line-group parse. Every record's
    id, sequence and quality string is value-checked."""
    import shutil

    from fireworks_spark.sources import read_fastq

    d = table(spark, sf_dir, "documents")
    h = F.md5(F.col("text").cast("binary"))
    fq = d.select(
        F.concat(
            F.lit("@"),
            F.col("doc_id").cast("string"),
            F.lit("\n"),
            F.upper(h),
            F.lit("\n+\n"),
            h,
        ).alias("value")
    )
    tmp = _scratch_dir(prefix="fw_fastq_")
    path = f"{tmp}/fq"
    try:
        # several part files -> the wholetext FASTQ read gets one task per
        # file (read_fastq's parallelism unit is the file)
        fq.repartition(8).write.text(path)
        back = read_fastq(spark, path)
        return (
            back.select(
                F.col("ids").cast("long").alias("doc_id"),
                F.col("sequences").alias("seq"),
                F.col("qualities").alias("qual"),
            )
            .orderBy("doc_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q123_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink (Message.read/to surface, io_formats.read_table/
    write_table): customer written as ORC, read back, aggregated against
    the original parquet — exercises the second columnar format end-to-end
    through the driver's value gate."""
    import shutil

    from fireworks_spark.io_formats import read_table, write_table

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    d = _scratch_dir(prefix="fw_orc_")
    path = f"{d}/t"
    try:
        write_table(c, path, "orc")
        back = read_table(spark, path, "orc")
        return (
            back.groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n"),
                (F.round(F.sum("c_acctbal"), 2) + F.lit(0.0)).alias("bal"),
                F.sum("c_custkey").alias("key_sum"),
            )
            .orderBy("c_mktsegment")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q124_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source/sink with a DECLARED schema on re-read (the at-scale
    contract — inference scans the data twice): values that need quoting
    (commas, quotes) ride along via a synthetic column, so the
    quote/escape handling is part of what the oracle checks."""
    import shutil

    from fireworks_spark.io_formats import read_table, write_table

    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.concat(F.lit('a,"b",'), F.col("c_name")).alias("tricky"),
    )
    d = _scratch_dir(prefix="fw_csv_")
    path = f"{d}/t"
    try:
        write_table(c, path, "csv")
        back = read_table(
            spark,
            path,
            "csv",
            schema="c_custkey bigint, c_mktsegment string, "
            "c_acctbal double, tricky string",
        )
        return (
            back.groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n"),
                (F.round(F.sum("c_acctbal"), 2) + F.lit(0.0)).alias("bal"),
                F.sum(F.length("tricky")).alias("tricky_len"),
            )
            .orderBy("c_mktsegment")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q125_genbank_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The GenBank source end-to-end: flat-file records synthesized from
    documents (LOCUS/DEFINITION/ACCESSION/VERSION + a coordinate-prefixed
    ORIGIN block), written as text parts, re-read with the '\\n//' record
    scan. Sequences use a letters-only md5 encoding (hex digits translated
    g-p) because GenBank sequences are letters and the parser strips
    coordinates/digits from ORIGIN lines — the oracle re-derives the same
    encoding, so id precedence (VERSION), name (LOCUS) and sequence
    reassembly are all value-checked."""
    import shutil

    from fireworks_spark.sources import read_genbank

    d = table(spark, sf_dir, "documents")
    seq = F.translate(
        F.md5(F.col("text").cast("binary")), "0123456789", "ghijklmnop"
    )
    rec = F.concat(
        F.lit("LOCUS       DOC"),
        F.col("doc_id").cast("string"),
        F.lit("  32 bp    DNA\nDEFINITION  synthetic record "),
        F.col("doc_id").cast("string"),
        F.lit(".\nACCESSION   A"),
        F.col("doc_id").cast("string"),
        F.lit("\nVERSION     A"),
        F.col("doc_id").cast("string"),
        F.lit(".1\nORIGIN\n        1 "),
        F.substring(seq, 1, 16),
        F.lit(" "),
        F.substring(seq, 17, 16),
        F.lit("\n//"),
    )
    tmp = _scratch_dir(prefix="fw_gb_")
    path = f"{tmp}/gb"
    try:
        d.select(rec.alias("value")).repartition(8).write.text(path)
        back = read_genbank(spark, path)
        return (
            back.select(
                F.regexp_replace("ids", r"^A|\.1$", "")
                .cast("long")
                .alias("doc_id"),
                F.col("names").alias("locus"),
                F.col("descriptions").alias("descr"),
                F.col("sequences").alias("seq"),
            )
            .orderBy("doc_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q144_embl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EMBL source end-to-end: flat-file records synthesized from
    documents (ID/AC/DE/DR/SQ line codes + count-suffixed sequence lines),
    written as text parts, re-read with the '\\n//' record scan. Sequences
    use the same letters-only md5 encoding as q125; the DR line carries
    the raw md5 hex so the dbxref parse is value-checked too. Id
    precedence (accession.SV), entry name, folded DE lines, dbxrefs and
    sequence reassembly are all oracle-checked."""
    import shutil

    from fireworks_spark.sources import read_embl

    d = table(spark, sf_dir, "documents")
    seq = F.translate(
        F.md5(F.col("text").cast("binary")), "0123456789", "ghijklmnop"
    )
    rec = F.concat(
        F.lit("ID   DOC"),
        F.col("doc_id").cast("string"),
        F.lit("; SV 1; linear; DNA; STD; UNC; 32 BP.\nAC   A"),
        F.col("doc_id").cast("string"),
        F.lit(";\nDE   synthetic record\nDE   "),
        F.col("doc_id").cast("string"),
        F.lit(".\nDR   MD5; "),
        F.md5(F.col("text").cast("binary")),
        F.lit(".\nSQ   Sequence 32 BP;\n     "),
        F.substring(seq, 1, 16),
        F.lit(" "),
        F.substring(seq, 17, 16),
        F.lit("        32\n//"),
    )
    tmp = _scratch_dir(prefix="fw_embl_")
    path = f"{tmp}/embl"
    try:
        d.select(rec.alias("value")).repartition(8).write.text(path)
        back = read_embl(spark, path)
        return (
            back.select(
                F.regexp_replace("ids", r"^A|\.1$", "")
                .cast("long")
                .alias("doc_id"),
                F.col("names").alias("entry"),
                F.col("descriptions").alias("descr"),
                F.col("sequences").alias("seq"),
                F.element_at("dbxrefs", 1).alias("xref"),
            )
            .orderBy("doc_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q171_swiss_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Swiss-Prot source end-to-end (the 5th BioSeqPipe filetype,
    matching its q121/q122/q125/q144 siblings): flat-text records
    synthesized from documents (ID/AC/DE/DR/SQ line codes), written as
    text parts, re-read with the '\\n//' record scan. Accession-first id
    precedence, entry name, folded DE lines, DR dbxrefs (trailing period
    stripped) and letters-only sequence reassembly are all
    oracle-checked."""
    import shutil

    from fireworks_spark.sources import read_swiss

    d = table(spark, sf_dir, "documents")
    seq = F.translate(
        F.md5(F.col("text").cast("binary")), "0123456789", "ghijklmnop"
    )
    rec = F.concat(
        F.lit("ID   DOC"),
        F.col("doc_id").cast("string"),
        F.lit("_SPEC        Reviewed;        32 AA.\nAC   A"),
        F.col("doc_id").cast("string"),
        F.lit(";\nDE   synthetic record\nDE   "),
        F.col("doc_id").cast("string"),
        F.lit(".\nDR   MD5; "),
        F.md5(F.col("text").cast("binary")),
        F.lit(".\nSQ   SEQUENCE   32 AA;  2048 MW;  0 CRC64;\n     "),
        F.substring(seq, 1, 16),
        F.lit(" "),
        F.substring(seq, 17, 16),
        F.lit("\n//"),
    )
    tmp = _scratch_dir(prefix="fw_swiss_")
    path = f"{tmp}/swiss"
    try:
        d.select(rec.alias("value")).repartition(8).write.text(path)
        back = read_swiss(spark, path)
        return (
            back.select(
                F.regexp_replace("ids", r"^A", "")
                .cast("long")
                .alias("doc_id"),
                F.col("names").alias("entry"),
                F.col("descriptions").alias("descr"),
                F.col("sequences").alias("seq"),
                F.element_at("dbxrefs", 1).alias("xref"),
            )
            .orderBy("doc_id")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q126_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source/sink with declared schema on re-read: unicode and
    quote-bearing strings survive the JSON escaping loop; aggregated
    against the original parquet."""
    import shutil

    from fireworks_spark.io_formats import read_table, write_table

    c = table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.concat(F.lit('q"uo\\te '), F.col("c_name")).alias("tricky"),
    )
    d = _scratch_dir(prefix="fw_json_")
    path = f"{d}/t"
    try:
        write_table(c, path, "json")
        back = read_table(
            spark,
            path,
            "json",
            schema="c_custkey bigint, c_mktsegment string, "
            "c_acctbal double, tricky string",
        )
        return (
            back.groupBy("c_mktsegment")
            .agg(
                F.count(F.lit(1)).alias("n"),
                (F.round(F.sum("c_acctbal"), 2) + F.lit(0.0)).alias("bal"),
                F.sum(F.length("tricky")).alias("tricky_len"),
            )
            .orderBy("c_mktsegment")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q151_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact join through bucketed catalog tables: customer and
    orders hash-bucketed on the join key AT WRITE TIME, then joined with
    io_formats.bucketed_join — the pay-the-shuffle-once ingest layout for
    repeated 100 TB fact-to-fact joins. The zero-Exchange physical plan is
    asserted in tests/test_io_formats.py; this registry row value-checks
    the join RESULT against the plain-join oracle, so a bucketing bug that
    silently drops or misroutes rows (mismatched hash, bucket pruning)
    fails the driver, not just the plan shape."""
    import os
    import shutil
    from urllib.parse import urlparse

    from fireworks_spark import io_formats

    # a warehouse dir left by a PREVIOUS session isn't in this session's
    # in-memory catalog, so overwrite alone raises LOCATION_ALREADY_EXISTS
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "")).path
    for t in ("q151_cust_b", "q151_ord_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        if wh:
            shutil.rmtree(os.path.join(wh, t), ignore_errors=True)

    c = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    o = table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_totalprice"
    )
    io_formats.write_bucketed(c, "q151_cust_b", ["c_custkey"], num_buckets=8)
    io_formats.write_bucketed(o, "q151_ord_b", ["c_custkey"], num_buckets=8)
    return (
        io_formats.bucketed_join(
            spark, "q151_cust_b", "q151_ord_b", ["c_custkey"]
        )
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.round(F.sum("o_totalprice"), 2) + F.lit(0.0)).alias("rev"),
        )
        .orderBy("c_mktsegment")
    )


def q152_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order clustering value-checked: part rows are range-clustered
    along the Morton curve over (p_size, p_partkey) by io_formats.
    zorder_sort (the data-skipping layout — every output file covers a
    small hyper-rectangle so min/max footers prune on EITHER column), and
    the query returns each row's interleaved key, which the oracle
    re-derives bit-by-bit in SQL. Checks both no-row-loss through the
    range exchange and the exact bit interleave. bits=16 covers the test
    scales (p_partkey < 65536 through sf0.3); larger keys clamp, which
    the operator documents as the caller's rank/offset duty."""
    from fireworks_spark import io_formats

    p = table(spark, sf_dir, "part").select("p_partkey", "p_size")
    z = io_formats.zorder_sort(p, ["p_size", "p_partkey"], bits=16)
    return z.select(
        "p_partkey",
        "p_size",
        io_formats.zorder_key(["p_size", "p_partkey"], bits=16).alias(
            "zkey"
        ),
    ).orderBy("p_partkey")


def _zorder_sql(cols: list[str], bits: int = 16) -> str:
    """The Morton interleave as plain SQL bit arithmetic (mirrors
    io_formats.zorder_key: bit i of column j lands at position i*n+j)."""
    n = len(cols)
    clamped = [
        f"LEAST(GREATEST(CAST({c} AS BIGINT), 0), {(1 << bits) - 1})"
        for c in cols
    ]
    # every term fully parenthesized: DuckDB gives | and << equal
    # precedence, so an unwrapped chain reassociates as ((a<<i)|b)<<j
    terms = [
        f"((({clamped[j]} >> {i}) & 1) << {i * n + j})"
        for i in range(bits)
        for j in range(n)
    ]
    return " | ".join(terms)


def q156_sparse_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sparse-matrix connector end-to-end (Message.read/to 'sparse',
    reference message.py:180-235): orders as (orderkey, custkey, price)
    COO triplets written as per-partition scipy-compatible .npz parts
    (plain-numpy codec) and read back one file per task, then aggregated
    against the original parquet — any codec loss (dtype downcast,
    dropped triplets, shape truncation) surfaces as a value mismatch."""
    import shutil

    from fireworks_spark.edge_formats import read_sparse, write_sparse

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    d = _scratch_dir(prefix="fw_sparse_")
    try:
        write_sparse(
            o.repartition(4), d, "o_orderkey", "o_custkey", "o_totalprice"
        )
        back = read_sparse(spark, d)
        return (
            back.groupBy((F.col("col") % 7).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                (F.round(F.sum("value"), 2) + F.lit(0.0)).alias("price"),
                F.sum("row").alias("key_sum"),
            )
            .orderBy("bucket")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


def q181_sparse_manifest_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The manifest commit protocol end-to-end (fireworks_spark.publish,
    the object-store-safe alternative to the two-rename swap): TWO
    manifest-committed generations are written to one table path — a
    decoy half-corpus first, then the full triplet set — and the read
    must see ONLY the newest committed generation (a sweep or
    manifest-resolution defect would double-count or mix generations and
    flip the aggregate hash). Same oracle as q156: the original parquet
    re-derives the aggregate."""
    import shutil

    from fireworks_spark.edge_formats import read_sparse, write_sparse

    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    d = _scratch_dir(prefix="fw_sparse_m_")
    try:
        write_sparse(
            o.filter(F.col("o_orderkey") % 2 == 0).repartition(2),
            d, "o_orderkey", "o_custkey", "o_totalprice",
            commit_protocol="manifest",
        )
        write_sparse(
            o.repartition(4), d, "o_orderkey", "o_custkey", "o_totalprice",
            commit_protocol="manifest",
        )
        back = read_sparse(spark, d)
        return (
            back.groupBy((F.col("col") % 7).alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                (F.round(F.sum("value"), 2) + F.lit(0.0)).alias("price"),
                F.sum("row").alias("key_sum"),
            )
            .orderBy("bucket")
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(d, ignore_errors=True)


DATABASE_QUERIES = {
    "q156_sparse_roundtrip": q156_sparse_roundtrip,
    "q181_sparse_manifest_roundtrip": q181_sparse_manifest_roundtrip,
    "q151_bucketed_join": q151_bucketed_join,
    "q152_zorder_key": q152_zorder_key,
    "q118_transaction_semantics": q118_transaction_semantics,
    "q125_genbank_roundtrip": q125_genbank_roundtrip,
    "q144_embl_roundtrip": q144_embl_roundtrip,
    "q171_swiss_roundtrip": q171_swiss_roundtrip,
    "q126_json_roundtrip": q126_json_roundtrip,
    "q123_orc_roundtrip": q123_orc_roundtrip,
    "q124_csv_roundtrip": q124_csv_roundtrip,
    "q121_fasta_roundtrip": q121_fasta_roundtrip,
    "q177_qual_roundtrip": q177_qual_roundtrip,
    "q178_pir_roundtrip": q178_pir_roundtrip,
    "q179_phylip_roundtrip": q179_phylip_roundtrip,
    "q180_clustal_roundtrip": q180_clustal_roundtrip,
    "q182_stockholm_roundtrip": q182_stockholm_roundtrip,
    "q183_nexus_roundtrip": q183_nexus_roundtrip,
    "q185_ig_roundtrip": q185_ig_roundtrip,
    "q186_phd_roundtrip": q186_phd_roundtrip,
    "q187_pdb_seqres_roundtrip": q187_pdb_seqres_roundtrip,
    "q188_nib_roundtrip": q188_nib_roundtrip,
    "q189_seqxml_roundtrip": q189_seqxml_roundtrip,
    "q190_twobit_roundtrip": q190_twobit_roundtrip,
    "q191_uniprot_xml_roundtrip": q191_uniprot_xml_roundtrip,
    "q192_cif_seqres_roundtrip": q192_cif_seqres_roundtrip,
    "q122_fastq_roundtrip": q122_fastq_roundtrip,
    "q114_feather_roundtrip": q114_feather_roundtrip,
    "q116_stata_roundtrip": q116_stata_roundtrip,
    "q133_excel_roundtrip": q133_excel_roundtrip,
    "q141_msgpack_roundtrip": q141_msgpack_roundtrip,
    "q117_html_roundtrip": q117_html_roundtrip,
    "q60_delete_semantics": q60_delete_semantics,
    "q61_update_semantics": q61_update_semantics,
    "q62_upsert_semantics": q62_upsert_semantics,
}

DATABASE_ORACLE = {
    "q156_sparse_roundtrip": (
        "SELECT CAST(o_custkey % 7 AS BIGINT) AS bucket, COUNT(*) AS n, "
        "ROUND(SUM(o_totalprice), 2) + 0.0 AS price, "
        "CAST(SUM(o_orderkey) AS BIGINT) AS key_sum "
        "FROM orders GROUP BY 1 ORDER BY 1"
    ),
    "q181_sparse_manifest_roundtrip": (
        "SELECT CAST(o_custkey % 7 AS BIGINT) AS bucket, COUNT(*) AS n, "
        "ROUND(SUM(o_totalprice), 2) + 0.0 AS price, "
        "CAST(SUM(o_orderkey) AS BIGINT) AS key_sum "
        "FROM orders GROUP BY 1 ORDER BY 1"
    ),
    "q151_bucketed_join": (
        "SELECT c_mktsegment, COUNT(*) AS n, "
        "ROUND(SUM(o_totalprice), 2) + 0.0 AS rev "
        "FROM customer JOIN orders ON o_custkey = c_custkey "
        "GROUP BY 1 ORDER BY 1"
    ),
    "q152_zorder_key": (
        "SELECT p_partkey, p_size, CAST("
        + _zorder_sql(["p_size", "p_partkey"], 16)
        + " AS BIGINT) AS zkey FROM part ORDER BY p_partkey"
    ),
    "q125_genbank_roundtrip": (
        "SELECT doc_id, 'DOC' || doc_id AS locus, "
        "'synthetic record ' || doc_id || '.' AS descr, "
        "upper(translate(md5(text), '0123456789', 'ghijklmnop')) AS seq "
        "FROM documents ORDER BY doc_id"
    ),
    "q144_embl_roundtrip": (
        "SELECT doc_id, 'DOC' || doc_id AS entry, "
        "'synthetic record ' || doc_id || '.' AS descr, "
        "upper(translate(md5(text), '0123456789', 'ghijklmnop')) AS seq, "
        "'MD5; ' || md5(text) AS xref "
        "FROM documents ORDER BY doc_id"
    ),
    "q171_swiss_roundtrip": (
        "SELECT doc_id, 'DOC' || doc_id || '_SPEC' AS entry, "
        "'synthetic record ' || doc_id || '.' AS descr, "
        "upper(translate(md5(text), '0123456789', 'ghijklmnop')) AS seq, "
        "'MD5; ' || md5(text) AS xref "
        "FROM documents ORDER BY doc_id"
    ),
    "q126_json_roundtrip": (
        "SELECT c_mktsegment, count(*) AS n, "
        "ROUND(SUM(c_acctbal), 2) AS bal, "
        "CAST(SUM(8 + LENGTH(c_name)) AS BIGINT) AS tricky_len "
        "FROM customer GROUP BY 1 ORDER BY 1"
    ),
    "q123_orc_roundtrip": (
        "SELECT c_mktsegment, count(*) AS n, "
        "ROUND(SUM(c_acctbal), 2) AS bal, "
        "CAST(SUM(c_custkey) AS BIGINT) AS key_sum "
        "FROM customer GROUP BY 1 ORDER BY 1"
    ),
    "q124_csv_roundtrip": (
        "SELECT c_mktsegment, count(*) AS n, "
        "ROUND(SUM(c_acctbal), 2) AS bal, "
        "CAST(SUM(6 + LENGTH(c_name)) AS BIGINT) AS tricky_len "
        "FROM customer GROUP BY 1 ORDER BY 1"
    ),
    "q121_fasta_roundtrip": (
        "SELECT doc_id, upper(md5(text)) AS seq FROM documents "
        "ORDER BY doc_id"
    ),
    "q177_qual_roundtrip": (
        "SELECT doc_id, (doc_id % 60)::VARCHAR || ' ' || "
        "((doc_id * 7) % 60)::VARCHAR || ' ' || "
        "(length(text) % 60)::VARCHAR AS scores "
        "FROM documents ORDER BY doc_id"
    ),
    "q178_pir_roundtrip": (
        "SELECT doc_id, 'P1' AS ptype, "
        "'synthetic protein ' || doc_id::VARCHAR AS descr, "
        "upper(md5(text)) AS seq FROM documents ORDER BY doc_id"
    ),
    "q179_phylip_roundtrip": (
        "SELECT doc_id, upper(md5(text)) AS seq FROM documents "
        "ORDER BY doc_id"
    ),
    "q180_clustal_roundtrip": (
        "SELECT doc_id, upper(md5(text)) AS seq FROM documents "
        "ORDER BY doc_id"
    ),
    "q182_stockholm_roundtrip": (
        "SELECT doc_id, upper(md5(text)) AS seq, "
        "'doc ' || doc_id::VARCHAR AS descr FROM documents "
        "ORDER BY doc_id"
    ),
    "q183_nexus_roundtrip": (
        "SELECT doc_id, upper(md5(text)) AS seq FROM documents "
        "ORDER BY doc_id"
    ),
    "q185_ig_roundtrip": (
        "SELECT doc_id, upper(md5(text)) AS seq, "
        "'doc ' || doc_id::VARCHAR AS descr FROM documents "
        "ORDER BY doc_id"
    ),
    "q186_phd_roundtrip": (
        "SELECT doc_id, md5(text) AS seq, "
        "array_to_string(list_transform(generate_series(1, 32), "
        "x -> (doc_id + x) % 60), ' ') AS quals "
        "FROM documents ORDER BY doc_id"
    ),
    "q187_pdb_seqres_roundtrip": (
        "SELECT doc_id, translate(upper(md5(text)), '0123456789B', "
        "'GHIKLMNPQRS') AS seq, "
        "'mol:protein length:32' AS descr "
        "FROM documents WHERE doc_id % 97 = 0 AND doc_id < 1679616 "
        "ORDER BY doc_id"
    ),
    "q188_nib_roundtrip": (
        "SELECT doc_id, translate(md5(text), '0123456789abcdef', "
        "'ACGTNacgtnACGTNa') AS seq "
        "FROM documents WHERE doc_id % 97 = 0 ORDER BY doc_id"
    ),
    "q189_seqxml_roundtrip": (
        "SELECT doc_id, upper(md5(text)) AS seq, "
        "'doc <' || doc_id::VARCHAR || '> & \"x\"' AS descr "
        "FROM documents ORDER BY doc_id"
    ),
    "q190_twobit_roundtrip": (
        "SELECT doc_id, translate(md5(text), '0123456789abcdef', "
        "'ACGTNacgtnACGTNa') AS seq "
        "FROM documents ORDER BY doc_id"
    ),
    "q191_uniprot_xml_roundtrip": (
        "SELECT doc_id, 'D' || doc_id::VARCHAR || '_HUMAN' AS nm, "
        "upper(md5(text)) AS seq, "
        "'protein <' || doc_id::VARCHAR || '> & \"x\"' AS descr "
        "FROM documents ORDER BY doc_id"
    ),
    "q192_cif_seqres_roundtrip": (
        "SELECT doc_id, translate(upper(md5(text)), '0123456789B', "
        "'GHIKLMNPQRS') AS seq "
        "FROM documents ORDER BY doc_id"
    ),
    "q122_fastq_roundtrip": (
        "SELECT doc_id, upper(md5(text)) AS seq, md5(text) AS qual "
        "FROM documents ORDER BY doc_id"
    ),
    "q118_transaction_semantics": (
        "SELECT c_custkey, CASE WHEN c_custkey % 7 = 0 THEN 0.0 "
        "ELSE c_acctbal END AS c_acctbal "
        "FROM customer WHERE c_custkey % 10 <> 3 "
        "UNION ALL "
        "SELECT c_custkey + 10000000 AS c_custkey, 111.0 AS c_acctbal "
        "FROM customer WHERE c_custkey % 100 = 50 "
        "ORDER BY c_custkey"
    ),
    "q114_feather_roundtrip": (
        "SELECT c_mktsegment, count(*) AS n, "
        "ROUND(SUM(c_acctbal), 2) AS bal, "
        "CAST(SUM(c_custkey) AS BIGINT) AS key_sum "
        "FROM customer GROUP BY 1 ORDER BY 1"
    ),
    "q116_stata_roundtrip": (
        "SELECT c_mktsegment, count(*) AS n, "
        "ROUND(SUM(c_acctbal), 2) AS bal, "
        "CAST(SUM(c_custkey) AS BIGINT) AS key_sum "
        "FROM customer GROUP BY 1 ORDER BY 1"
    ),
    "q141_msgpack_roundtrip": (
        "SELECT c_mktsegment, count(*) AS n, "
        "ROUND(SUM(c_acctbal), 2) AS bal, "
        "CAST(SUM(c_custkey) AS BIGINT) AS key_sum "
        "FROM customer GROUP BY 1 ORDER BY 1"
    ),
    "q133_excel_roundtrip": (
        "SELECT c_mktsegment, count(*) AS n, "
        "ROUND(SUM(c_acctbal), 2) AS bal, "
        "CAST(SUM(c_custkey) AS BIGINT) AS key_sum "
        "FROM customer GROUP BY 1 ORDER BY 1"
    ),
    "q117_html_roundtrip": (
        "SELECT c_mktsegment, count(*) AS n, "
        "CAST(SUM(c_custkey) AS BIGINT) AS key_sum, "
        "CAST(SUM(5 + LENGTH(c_name)) AS BIGINT) AS marked_len "
        "FROM customer GROUP BY 1 ORDER BY 1"
    ),

    "q60_delete_semantics": (
        "SELECT c_custkey FROM customer WHERE c_custkey % 10 <> 3 "
        "ORDER BY c_custkey"
    ),
    "q61_update_semantics": (
        "SELECT c_custkey, CASE WHEN c_custkey % 7 = 0 THEN 0.0 "
        "ELSE c_acctbal END AS c_acctbal FROM customer ORDER BY c_custkey"
    ),
    "q62_upsert_semantics": (
        "SELECT c_custkey, CASE WHEN c_custkey % 100 = 0 THEN 999.0 "
        "ELSE c_acctbal END AS c_acctbal FROM customer "
        "UNION ALL "
        "SELECT c_custkey + 10000000 AS c_custkey, 111.0 AS c_acctbal "
        "FROM customer WHERE c_custkey % 100 = 50 "
        "ORDER BY c_custkey"
    ),
}
