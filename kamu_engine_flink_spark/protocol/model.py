"""ODF engine protocol model.

Python dataclasses mirroring the kamu-core-manifests shapes the reference
consumes (field names reconstructed from use sites —
TransformEngine.scala:64-154, RawQueryEngine.scala:56-113; the manifests
submodule is empty in the reference checkout, see SURVEY.md §1.2).

Timestamps are timezone-aware UTC datetimes. `op` codes follow
Op.scala:5-18: 0=Append(+I), 1=Retract(-D), 2=CorrectFrom(-U),
3=CorrectTo(+U).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone

OP_APPEND = 0
OP_RETRACT = 1
OP_CORRECT_FROM = 2
OP_CORRECT_TO = 3


class InvalidQueryError(Exception):
    """Maps to TransformResponse.InvalidQuery (TransformApp.scala:73-77)."""


class ExecuteError(Exception):
    """Maps to TransformResponse.InternalError (TransformApp.scala:78-83)."""


@dataclass(frozen=True)
class DatasetVocabulary:
    """Configurable system-column names (SURVEY.md §1.2)."""

    offset_column: str = "offset"
    operation_type_column: str = "op"
    system_time_column: str = "system_time"
    event_time_column: str = "event_time"

    @property
    def system_columns(self) -> tuple[str, str, str]:
        """Columns stripped before user SQL sees the table
        (TransformEngine.scala:234-248; event_time stays visible)."""
        return (self.offset_column, self.operation_type_column, self.system_time_column)


@dataclass(frozen=True)
class OffsetInterval:
    start: int
    end: int  # inclusive, like the reference (TransformEngine.scala:432-449)


@dataclass(frozen=True)
class Watermark:
    system_time: datetime
    event_time: datetime


@dataclass(frozen=True)
class SqlQueryStep:
    query: str
    alias: str | None = None  # None => this step is the output


@dataclass(frozen=True)
class TemporalTable:
    """Declares an input as a versioned (temporal) table keyed by
    `primary_key`, versioned by its event_time
    (TransformEngine.scala:163-200; composite PK rejected at :194-197)."""

    name: str
    primary_key: list[str] = field(default_factory=list)


@dataclass(frozen=True)
class Transform:
    queries: list[SqlQueryStep]
    temporal_tables: list[TemporalTable] = field(default_factory=list)
    engine: str = "spark"


@dataclass(frozen=True)
class TransformRequestInput:
    query_alias: str
    data_paths: list[str]
    schema_file: str
    vocab: DatasetVocabulary = field(default_factory=DatasetVocabulary)
    offset_interval: OffsetInterval | None = None
    explicit_watermarks: list[Watermark] = field(default_factory=list)
    dataset_id: str | None = None
    dataset_alias: str | None = None

    def id_or_alias(self) -> str:
        return self.dataset_id or self.query_alias


@dataclass(frozen=True)
class TransformRequest:
    transform: Transform
    query_inputs: list[TransformRequestInput]
    system_time: datetime
    next_offset: int
    prev_checkpoint_path: str | None
    new_checkpoint_path: str
    new_data_path: str
    vocab: DatasetVocabulary = field(default_factory=DatasetVocabulary)
    dataset_id: str = "output"


@dataclass(frozen=True)
class TransformResponse:
    new_offset_interval: OffsetInterval | None
    new_watermark: datetime | None


@dataclass(frozen=True)
class RawQueryRequest:
    """Stateless batch SQL over parquet (RawQueryEngine.scala:56-113):
    input registered as plain table `input`, no system columns."""

    input_data_paths: list[str]
    transform: Transform
    output_data_path: str


@dataclass(frozen=True)
class RawQueryResponse:
    num_records: int


def utc(year: int, month: int, day: int, hour: int = 0, minute: int = 0, second: int = 0) -> datetime:
    """UTC datetime helper, mirrors the test fixtures' ts() helper
    (TimeHelpers.scala:14-18)."""
    return datetime(year, month, day, hour, minute, second, tzinfo=timezone.utc)
