from fastforward_tpu.export.encodings import (
    LegacySchemaHandler,
    LPBQProcessor,
    QuantizerEncoding,
    V1SchemaHandler,
    V2SchemaHandler,
)
from fastforward_tpu.export.stablehlo import collect_encodings, export, export_modules

__all__ = [
    "export",
    "export_modules",
    "collect_encodings",
    "QuantizerEncoding",
    "LegacySchemaHandler",
    "V1SchemaHandler",
    "V2SchemaHandler",
    "LPBQProcessor",
]
