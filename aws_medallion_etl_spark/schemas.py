"""Schema contracts for the reference's five source tables.

The reference mandates explicit ``StructType`` contracts — never
``inferSchema`` (``README.md:777``, ``copilot-instructions.md:62``) —
with raw→snake_case renames and per-table validation/NK/dedup config:

* users — ``Meta_Guideline.md:885-898`` (schema + mapping),
  NK ``user_id``, dedup order ``desc(ingest_ts), desc(signup_ts),
  desc_nulls_last(country_code)`` (``Meta_Guideline.md:1607-1617``)
* datasets — ``Meta_Guideline.md:1063-1088``
* tags — ``Meta_Guideline.md:1248-1251`` (JSON-array string column)
* competitions / kernels — bronze contract
  ``requirements/meta/meta_module_06_requirements.md:49-57``; the
  silver competitions schema is widened per SURVEY.md §7.4.5.

Everything here is declarative data: ``TABLES[name]`` carries what a
``pipeline.TableSpec`` needs to run the reference's medallion flow on
real CSVs. Rules are factories because Column expressions require an
active session.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from aws_medallion_etl_spark.operators import validate

TS_FORMAT = "yyyy-MM-dd HH:mm:ss"  # Meta_Guideline.md:926-927


def _string_schema(*names: str) -> StructType:
    """Raw CSVs land all-string (reference pattern); types are applied
    in the bronze projection, not inferred."""
    return StructType([StructField(n, StringType()) for n in names])


@dataclass(frozen=True)
class TableContract:
    """Declarative per-table contract: schema, renames, typing, rules."""

    name: str
    raw_schema: StructType
    rename: dict[str, str]
    typed_columns: dict[str, object] = field(default_factory=dict)
    natural_key: list[str] = field(default_factory=list)
    dedup_order: list[str] = field(default_factory=list)
    rules: Callable[[], list[validate.Rule]] = field(default=lambda: [])


def _users_rules() -> list[validate.Rule]:
    # requirements/...:49-57: user_id + user_name required; country 2 chars
    return [
        validate.Rule("missing_user_id", validate.null_or_blank("user_id")),
        validate.Rule("missing_user_name", validate.null_or_blank("user_name")),
        validate.Rule(
            "bad_country_code",
            F.col("country_code").isNotNull() & (F.length("country_code") != 2),
        ),
    ]


def _datasets_rules() -> list[validate.Rule]:
    return [
        validate.Rule("missing_dataset_id", validate.null_or_blank("dataset_id")),
        validate.Rule("missing_title", validate.null_or_blank("dataset_title")),
        validate.Rule("missing_owner", validate.null_or_blank("owner_user_id")),
        validate.Rule(
            "updated_before_created",
            F.col("updated_ts").isNotNull()
            & F.col("created_ts").isNotNull()
            & (F.col("updated_ts") < F.col("created_ts")),
        ),
    ]


def _competitions_rules() -> list[validate.Rule]:
    return [
        validate.Rule("missing_competition_id", validate.null_or_blank("competition_id")),
        validate.Rule("missing_title", validate.null_or_blank("title")),
        validate.Rule(
            "deadline_before_start",
            F.col("start_ts").isNotNull()
            & F.col("deadline_ts").isNotNull()
            & (F.col("start_ts") > F.col("deadline_ts")),
        ),
        validate.Rule(
            "negative_prize",
            F.col("prize_money").isNotNull() & (F.col("prize_money") < 0),
        ),
    ]


def _tags_rules() -> list[validate.Rule]:
    return [
        validate.Rule("missing_dataset_id", validate.null_or_blank("dataset_id")),
        validate.Rule("missing_tags", validate.null_or_blank("tags")),
    ]


def _kernels_rules() -> list[validate.Rule]:
    return [
        validate.Rule("missing_kernel_id", validate.null_or_blank("kernel_id")),
        validate.Rule("missing_author", validate.null_or_blank("author_user_id")),
        validate.Rule("missing_title", validate.null_or_blank("title")),
        validate.Rule(
            "updated_before_created",
            F.col("updated_ts").isNotNull()
            & F.col("created_ts").isNotNull()
            & (F.col("updated_ts") < F.col("created_ts")),
        ),
    ]


TABLES: dict[str, TableContract] = {
    "users": TableContract(
        name="users",
        raw_schema=_string_schema("Id", "UserName", "RegisterDate", "Country"),
        rename={
            "Id": "user_id",
            "UserName": "user_name",
            "RegisterDate": "signup_ts",
            "Country": "country_code",
        },
        typed_columns={"signup_ts": TimestampType()},
        natural_key=["user_id"],
        dedup_order=["signup_ts", "country_code"],
        rules=_users_rules,
    ),
    "datasets": TableContract(
        name="datasets",
        raw_schema=_string_schema(
            "Id", "Title", "OwnerUserId", "CreationDate", "LastActivityDate",
            "IsPrivate", "TotalViews", "TotalDownloads",
        ),
        rename={
            "Id": "dataset_id",
            "Title": "dataset_title",
            "OwnerUserId": "owner_user_id",
            "CreationDate": "created_ts",
            "LastActivityDate": "updated_ts",
            "IsPrivate": "is_private",
            "TotalViews": "total_views",
            "TotalDownloads": "total_downloads",
        },
        typed_columns={
            "created_ts": TimestampType(),
            "updated_ts": TimestampType(),
            "is_private": BooleanType(),
            "total_views": LongType(),
            "total_downloads": LongType(),
        },
        natural_key=["dataset_id"],
        dedup_order=["updated_ts", "total_views"],
        rules=_datasets_rules,
    ),
    "competitions": TableContract(
        name="competitions",
        raw_schema=_string_schema(
            "Id", "Title", "Category", "EnabledDate", "DeadlineDate", "RewardQuantity"
        ),
        rename={
            "Id": "competition_id",
            "Title": "title",
            "Category": "category",
            "EnabledDate": "start_ts",
            "DeadlineDate": "deadline_ts",
            "RewardQuantity": "prize_money",
        },
        typed_columns={
            "start_ts": TimestampType(),
            "deadline_ts": TimestampType(),
            "prize_money": "double",
        },
        natural_key=["competition_id"],
        dedup_order=["start_ts"],
        rules=_competitions_rules,
    ),
    "tags": TableContract(
        name="tags",
        raw_schema=_string_schema("DatasetId", "Tags"),
        rename={"DatasetId": "dataset_id", "Tags": "tags"},
        natural_key=["dataset_id", "tags"],
        dedup_order=["tags"],
        rules=_tags_rules,
    ),
    "kernels": TableContract(
        name="kernels",
        raw_schema=_string_schema(
            "Id", "AuthorUserId", "Title", "CreationDate", "LastActivityDate"
        ),
        rename={
            "Id": "kernel_id",
            "AuthorUserId": "author_user_id",
            "Title": "title",
            "CreationDate": "created_ts",
            "LastActivityDate": "updated_ts",
        },
        typed_columns={"created_ts": TimestampType(), "updated_ts": TimestampType()},
        natural_key=["kernel_id"],
        dedup_order=["updated_ts"],
        rules=_kernels_rules,
    ),
}


def apply_types(df, contract: TableContract):
    """Bronze typing projection: parse timestamps/booleans/numerics from
    the all-string raw frame (``to_timestamp`` with the explicit format,
    ``Meta_Guideline.md:926-927``; boolean via the strict when-chain)."""
    from aws_medallion_etl_spark.operators import clean

    out = df
    for col, dtype in contract.typed_columns.items():
        if isinstance(dtype, TimestampType):
            # try_to_timestamp: malformed input -> NULL (then caught by
            # validation rules), matching the reference's pre-ANSI
            # semantics — plain to_timestamp THROWS under ANSI mode.
            out = out.withColumn(col, F.try_to_timestamp(col, F.lit(TS_FORMAT)))
        elif isinstance(dtype, BooleanType):
            out = out.withColumn(col, clean.parse_boolean(col))
        else:
            type_name = dtype if isinstance(dtype, str) else dtype.simpleString()
            out = out.withColumn(col, F.expr(f"try_cast({col} AS {type_name})"))
    return out


def to_table_spec(contract: TableContract):
    """Bridge a contract into a ``pipeline.TableSpec``."""
    from aws_medallion_etl_spark import pipeline

    return pipeline.TableSpec(
        name=contract.name,
        rules=contract.rules,
        nk=contract.natural_key,
        dedup_order=contract.dedup_order,
    )
