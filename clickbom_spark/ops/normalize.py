"""Document normalization: read, unwrap, detect, SPDX-fix, convert.

Re-expresses the reference's per-file shell stages as DataFrame
transformations over a docs DataFrame (one row per SBOM document):

- read_sboms     ← S9/S10 scan + C2 validation gate
- unwrap         ← extract_sbom_from_wrapper (lib/sbom-processing.sh:38-55)
- detect_format  ← detect_sbom_format       (lib/sbom-processing.sh:57-91)
- fix_spdx       ← fix_spdx_compatibility   (lib/sbom-processing.sh:7-35)
- spdx_to_cdx /
  cdx_to_spdx    ← convert_sbom             (lib/sbom-processing.sh:93-152),
                   as pure structural column mappings instead of the
                   reference's `cyclonedx convert` CLI subprocess.

Everything is built-in Column expressions — no UDFs — so the whole
stage participates in Catalyst optimization and whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from clickbom_spark.schemas import doc_fields, sbom_schema

FORMAT_CYCLONEDX = "cyclonedx"
FORMAT_SPDX = "spdxjson"
FORMAT_SWID = "swid"


def read_sboms(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Distributed scan of SBOM JSON documents.

    One multi-line JSON object per file; PERMISSIVE mode captures parse
    failures in ``_corrupt_record`` (the jq-validation gate C2 — invalid
    docs are filterable, not fatal, matching the merge path's
    skip-with-warning behavior at lib/sbom-merging.sh:197-202).

    Replaces the reference's list+download-each loop (O(files) network
    round trips, lib/sbom-merging.sh:111-253) with one FileSourceScan;
    Spark parallelizes over files.
    """
    return (
        spark.read.schema(sbom_schema())
        .option("multiLine", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .withColumn("filename", F.input_file_name())
    )


def valid_docs(df: DataFrame) -> DataFrame:
    """C2 validation gate: keep only parseable JSON documents."""
    return df.where(F.col("_corrupt_record").isNull())


def unwrap(df: DataFrame) -> DataFrame:
    """Unwrap the GitHub ``{sbom: {...}}`` envelope (P3).

    If ``.sbom`` exists, project to it; otherwise identity
    (lib/sbom-processing.sh:38-55).  Non-doc columns (filename, ...)
    are preserved.
    """
    names = [f.name for f in doc_fields()]
    extra = [c for c in df.columns if c not in names and c not in ("sbom", "_corrupt_record")]
    picked = [
        F.when(F.col("sbom").isNotNull(), F.col(f"sbom.{n}"))
        .otherwise(F.col(n))
        .alias(n)
        for n in names
    ]
    return df.select(*picked, *extra)


def format_expr() -> F.Column:
    """Format classification predicate (P4).

    Priority per lib/sbom-processing.sh:57-91: CycloneDX on
    ``bomFormat == "CycloneDX"`` or presence of ``metadata.component``;
    SPDX on ``spdxVersion``/``SPDXID``; SWID on ``SoftwareIdentity``;
    unknown defaults to SPDX (line 89-90).
    """
    return (
        F.when(
            (F.col("bomFormat") == "CycloneDX")
            | F.col("metadata.component").isNotNull(),
            F.lit(FORMAT_CYCLONEDX),
        )
        .when(
            F.col("spdxVersion").isNotNull() | F.col("SPDXID").isNotNull(),
            F.lit(FORMAT_SPDX),
        )
        .when(F.col("SoftwareIdentity").isNotNull(), F.lit(FORMAT_SWID))
        .otherwise(F.lit(FORMAT_SPDX))
    )


def detect_format(df: DataFrame) -> DataFrame:
    return df.withColumn("sbom_format", format_expr())


def fix_spdx(df: DataFrame) -> DataFrame:
    """Rewrite SPDX ``referenceCategory`` values (P10).

    ``PACKAGE-MANAGER`` → ``PACKAGE_MANAGER``; the valid set
    {PACKAGE_MANAGER, SECURITY, PERSISTENT_ID, OTHER} passes through;
    anything else → ``OTHER`` (lib/sbom-processing.sh:7-35).

    The reference walks the whole JSON tree with jq ``walk()`` — here a
    targeted ``transform`` over ``packages[].externalRefs[]`` (the only
    site where the field occurs) keeps it a pure columnar rewrite.
    """
    valid = ("PACKAGE_MANAGER", "SECURITY", "PERSISTENT_ID", "OTHER")
    fixed = F.transform(
        F.col("packages"),
        lambda p: p.withField(
            "externalRefs",
            F.transform(
                p["externalRefs"],
                lambda r: r.withField(
                    "referenceCategory",
                    F.when(
                        r["referenceCategory"] == "PACKAGE-MANAGER",
                        F.lit("PACKAGE_MANAGER"),
                    )
                    .when(r["referenceCategory"].isin(*valid), r["referenceCategory"])
                    .when(r["referenceCategory"].isNull(), F.lit(None).cast("string"))
                    .otherwise(F.lit("OTHER")),
                ),
            ),
        ),
    )
    return df.withColumn(
        "packages", F.when(F.col("packages").isNotNull(), fixed)
    )


def spdx_to_cdx(df: DataFrame) -> DataFrame:
    """Structural SPDX → CycloneDX conversion (C1, CycloneDX target).

    Column mapping (the semantic content of `cyclonedx convert`):
    packages[] → components[] with name↔name, versionInfo↔version,
    licenseConcluded//licenseDeclared ↔ licenses[0].license.id.
    Doc metadata is re-wrapped as a CycloneDX 1.6 envelope.
    """
    comp = F.transform(
        F.col("packages"),
        lambda p: F.struct(
            F.lit("library").alias("type"),
            p["name"].alias("name"),
            p["versionInfo"].alias("version"),
            F.lit(None).cast("string").alias("purl"),
            F.array(
                F.struct(
                    F.struct(
                        F.coalesce(p["licenseConcluded"], p["licenseDeclared"]).alias(
                            "id"
                        ),
                        F.lit(None).cast("string").alias("name"),
                    ).alias("license"),
                    F.lit(None).cast("string").alias("id"),
                    F.lit(None).cast("string").alias("name"),
                    F.lit(None).cast("string").alias("expression"),
                )
            ).alias("licenses"),
            F.lit(None)
            .cast("array<struct<name:string,value:string>>")
            .alias("properties"),
            F.lit(None).cast("string").alias("source"),
        ),
    )
    return (
        df.withColumn("bomFormat", F.lit("CycloneDX"))
        .withColumn("specVersion", F.lit("1.6"))
        .withColumn("components", F.when(F.col("packages").isNotNull(), comp))
        .withColumn("packages", F.lit(None).cast(df.schema["packages"].dataType))
        .withColumn("sbom_format", F.lit(FORMAT_CYCLONEDX))
    )


def cdx_to_spdx(df: DataFrame) -> DataFrame:
    """Structural CycloneDX → SPDX conversion (C1, SPDX target)."""
    from clickbom_spark.ops.components import license_fallback_expr

    pkg = F.transform(
        F.col("components"),
        lambda c: F.struct(
            F.concat(F.lit("SPDXRef-"), F.coalesce(c["name"], F.lit("unknown"))).alias(
                "SPDXID"
            ),
            c["name"].alias("name"),
            c["version"].alias("versionInfo"),
            license_fallback_expr(c).alias("licenseConcluded"),
            F.lit(None).cast("string").alias("licenseDeclared"),
            F.lit(None)
            .cast(
                "array<struct<referenceCategory:string,referenceType:string,"
                "referenceLocator:string>>"
            )
            .alias("externalRefs"),
        ),
    )
    return (
        df.withColumn("spdxVersion", F.lit("SPDX-2.3"))
        .withColumn("SPDXID", F.lit("SPDXRef-DOCUMENT"))
        .withColumn("packages", F.when(F.col("components").isNotNull(), pkg))
        .withColumn("components", F.lit(None).cast(df.schema["components"].dataType))
        .withColumn("sbom_format", F.lit(FORMAT_SPDX))
    )


def convert(df: DataFrame, target_format: str | None) -> DataFrame:
    """Format dispatch (C1, lib/sbom-processing.sh:93-152).

    Identity when no target or already in target format; otherwise the
    structural conversion.  Requires ``sbom_format`` (run detect_format
    first).  Mixed-format inputs are handled row-wise: only rows not
    already in the target are converted.
    """
    if target_format is None:
        return df
    if target_format == FORMAT_CYCLONEDX:
        converted = spdx_to_cdx(df.where(F.col("sbom_format") != FORMAT_CYCLONEDX))
        kept = df.where(F.col("sbom_format") == FORMAT_CYCLONEDX)
        return kept.unionByName(converted)
    if target_format == FORMAT_SPDX:
        converted = cdx_to_spdx(df.where(F.col("sbom_format") != FORMAT_SPDX))
        kept = df.where(F.col("sbom_format") == FORMAT_SPDX)
        return kept.unionByName(converted)
    raise ValueError(f"unsupported target format: {target_format}")
