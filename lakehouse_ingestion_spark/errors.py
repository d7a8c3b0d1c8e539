"""Engine exception hierarchy.

Mirrors the failure surfaces of the reference (config load, schema
resolution, schema validation, DQ enforcement) without copying its code:
see reference ``config/ConfigLoader.scala:69-100`` (eager schema check),
``schema/SchemaValidator.scala:28-36`` (validateOrThrow),
``core/IngestionJob.scala:101-121`` (FAIL_FAST policy).
"""


class EngineError(Exception):
    """Base class for all engine errors."""


class ConfigError(EngineError):
    """Pipeline spec failed to parse or validate."""


class SchemaNotFoundError(EngineError):
    """Schema registry lookup failed for (domain, dataset, version)."""


class SchemaParseError(EngineError):
    """A schema file exists but is malformed — distinct from absence so
    callers (schema_exists, config validation) don't misreport a corrupt
    file as a missing one."""


class SchemaValidationError(EngineError):
    """DataFrame schema does not conform to the registered schema."""


class DataQualityError(EngineError):
    """A DQ rule set failed under the FAIL_FAST policy."""

    def __init__(self, message: str, summary=None):
        super().__init__(message)
        self.summary = summary


class UnsupportedFeatureError(EngineError):
    """Requested connector/format is not available in this environment."""
