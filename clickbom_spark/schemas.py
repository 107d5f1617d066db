"""Permissive StructTypes for the SBOM document model.

The reference is schema-on-read: every jq access tolerates missing
fields via ``//`` fallbacks (SURVEY.md §1.2).  We mirror that with one
explicitly-declared permissive schema covering CycloneDX, SPDX-JSON,
and the GitHub ``{sbom: {...}}`` envelope in a single read — missing
fields surface as nulls, exactly like jq's missing-path semantics, and
schema inference (which would make plans data-dependent) is never used.

Reference shapes: CycloneDX template at lib/sbom-merging.sh:282-304,
SPDX projection at entrypoint.sh:373-384, wrapper at
lib/sbom-processing.sh:38-55, detection keys at lib/sbom-processing.sh:57-91.

Scale note: SBOM documents are single multi-line JSON objects → one
file per read task.  At the 100 TB design point the engine explodes
components early (ops/components.py) and persists them as partitioned
parquet so everything downstream is columnar and splittable.
"""

from __future__ import annotations

from pyspark.sql import types as T


def _license_entry() -> T.StructType:
    # CycloneDX licenses[] entries: either {"license": {"id"/"name"}} or
    # bare {"id"/"name"/"expression"} (entrypoint.sh:333-339 probes all).
    return T.StructType(
        [
            T.StructField(
                "license",
                T.StructType(
                    [
                        T.StructField("id", T.StringType()),
                        T.StructField("name", T.StringType()),
                    ]
                ),
            ),
            T.StructField("id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("expression", T.StringType()),
        ]
    )


def _name_value() -> T.ArrayType:
    return T.ArrayType(
        T.StructType(
            [
                T.StructField("name", T.StringType()),
                T.StructField("value", T.StringType()),
            ]
        )
    )


def component_schema() -> T.StructType:
    """CycloneDX components[] element (FIXTURES.md A1)."""
    return T.StructType(
        [
            T.StructField("type", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("version", T.StringType()),
            T.StructField("purl", T.StringType()),
            T.StructField("licenses", T.ArrayType(_license_entry())),
            T.StructField("properties", _name_value()),
            # Present only in previously-merged documents
            # (entrypoint.sh:363-365).
            T.StructField("source", T.StringType()),
        ]
    )


def spdx_package_schema() -> T.StructType:
    """SPDX packages[] element (FIXTURES.md A2)."""
    return T.StructType(
        [
            T.StructField("SPDXID", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("versionInfo", T.StringType()),
            T.StructField("licenseConcluded", T.StringType()),
            T.StructField("licenseDeclared", T.StringType()),
            T.StructField(
                "externalRefs",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("referenceCategory", T.StringType()),
                            T.StructField("referenceType", T.StringType()),
                            T.StructField("referenceLocator", T.StringType()),
                        ]
                    )
                ),
            ),
        ]
    )


def doc_fields() -> list[T.StructField]:
    """Union of CycloneDX + SPDX top-level fields (one permissive doc)."""
    return [
        # CycloneDX
        T.StructField("bomFormat", T.StringType()),
        T.StructField("specVersion", T.StringType()),
        T.StructField("serialNumber", T.StringType()),
        T.StructField("version", T.LongType()),
        T.StructField(
            "metadata",
            T.StructType(
                [
                    T.StructField("timestamp", T.StringType()),
                    T.StructField(
                        "tools",
                        T.ArrayType(
                            T.StructType(
                                [
                                    T.StructField("vendor", T.StringType()),
                                    T.StructField("name", T.StringType()),
                                    T.StructField("version", T.StringType()),
                                ]
                            )
                        ),
                    ),
                    T.StructField(
                        "component",
                        T.StructType(
                            [
                                T.StructField("type", T.StringType()),
                                T.StructField("name", T.StringType()),
                                T.StructField("version", T.StringType()),
                                T.StructField("bom-ref", T.StringType()),
                            ]
                        ),
                    ),
                    T.StructField("properties", _name_value()),
                ]
            ),
        ),
        T.StructField("components", T.ArrayType(component_schema())),
        # SPDX
        T.StructField("spdxVersion", T.StringType()),
        T.StructField("SPDXID", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("documentNamespace", T.StringType()),
        T.StructField("packages", T.ArrayType(spdx_package_schema())),
        # SWID (detected, never processed — lib/sbom-processing.sh:84-87)
        T.StructField("SoftwareIdentity", T.StringType()),
    ]


def sbom_schema() -> T.StructType:
    """Full read schema: doc fields + the GitHub wrapper envelope +
    permissive-mode corrupt-record capture (C2 validation gate)."""
    return T.StructType(
        [
            *doc_fields(),
            T.StructField("sbom", T.StructType(doc_fields())),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )


def license_mapping_schema() -> T.StructType:
    """name → license dimension (license-mappings.json, FIXTURES.md A4)."""
    return T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("license", T.StringType()),
        ]
    )


COMPONENT_COLUMNS = ["name", "version", "license", "source"]
