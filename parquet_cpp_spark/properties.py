"""WriterProperties — the engine's unified writer configuration.

Analog of the reference's ``WriterProperties::Builder``
(``/root/reference/src/parquet/properties.h:141-347``): per-column encoding
overrides, dictionary on/off + page-size limit, statistics on/off,
compression, plus the engine-specific knobs (bloom columns, deterministic
sort key, partition sizing). A single object travels from job CLI ->
plans -> operators.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from . import chunk as chunkmod

DEFAULT_DICT_PAGE_LIMIT = 1 << 20   # properties.h:83
DEFAULT_DATA_PAGESIZE = 1 << 20     # properties.h:81
DEFAULT_TARGET_PARTITION_BYTES = 256 << 20


@dataclass
class WriterProperties:
    # per-column codec name override (None -> auto-selector); the reference's
    # per-column-path encoding config (properties.h:379-404)
    codec_overrides: dict[str, str] = field(default_factory=dict)
    dictionary_enabled: bool = True
    dictionary_pagesize_limit: int = DEFAULT_DICT_PAGE_LIMIT
    data_pagesize: int = DEFAULT_DATA_PAGESIZE  # page flush threshold
    statistics_enabled: bool = True
    compression: str = "UNCOMPRESSED"
    # data page layout version: V1 compresses the assembled page; V2 keeps
    # levels outside the compressed block (properties.h:363-377)
    format_version: str = "V1"
    bloom_columns: frozenset[str] = frozenset()
    sort_key: str | None = "doc_id"
    target_partition_bytes: int = DEFAULT_TARGET_PARTITION_BYTES

    def __post_init__(self):
        for col, name in self.codec_overrides.items():
            if name not in chunkmod.CODEC_IDS:
                raise ValueError(f"unknown codec {name!r} for column {col!r}")
        if self.compression not in chunkmod.COMPRESSION_IDS:
            raise ValueError(f"unknown compression {self.compression!r}")
        if self.format_version not in ("V1", "V2"):
            raise ValueError(f"unknown format_version "
                             f"{self.format_version!r}")
        if not self.dictionary_enabled:
            # reference parity: a dictionary encoding cannot be forced while
            # dictionaries are disabled (properties.h:224-232)
            bad = [c for c, n in self.codec_overrides.items()
                   if n in ("RLE_DICTIONARY", "PLAIN_DICTIONARY")]
            if bad:
                raise ValueError(
                    f"dictionary_enabled=False conflicts with dictionary "
                    f"codec override on column(s) {bad}")

    @property
    def compression_id(self) -> int:
        return chunkmod.COMPRESSION_IDS[self.compression]

    @property
    def data_page_version(self) -> int:
        return 2 if self.format_version == "V2" else 1
