"""File-format sources beyond the builtin read surface.

FASTA (BioSeqPipe, reference fireworks/toolbox/pipes.py:18-68): the
reference iterates Bio.SeqIO records one at a time in Python; here the
record boundary IS the line separator — ``spark.read.text(lineSep='>')``
splits the file into one row per record at scan time (splittable,
distributed), and the field extraction is pure JVM string expressions.
Column names match the reference Message: ids, names, descriptions,
sequences, dbxrefs (pipes.py:37-44).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_fasta(spark: SparkSession, path: str) -> DataFrame:
    """One row per FASTA record.

    - ids: first whitespace token of the header
    - names: == ids (plain-FASTA behavior of the reference's SeqIO parse)
    - descriptions: the full header line
    - sequences: all following lines, whitespace stripped
    - dbxrefs: always [] for plain FASTA (same as SeqIO)
    """
    raw = spark.read.text(path, lineSep=">")
    header = F.substring_index(F.col("value"), "\n", 1)
    body = F.expr(
        "substring(value, length(substring_index(value, '\n', 1)) + 2)"
    )
    return (
        raw.filter(F.trim("value") != "")
        .select(
            F.trim(F.substring_index(header, " ", 1)).alias("ids"),
            F.trim(F.substring_index(header, " ", 1)).alias("names"),
            F.trim(header).alias("descriptions"),
            F.regexp_replace(body, r"\s+", "").alias("sequences"),
            F.array().cast("array<string>").alias("dbxrefs"),
        )
    )
