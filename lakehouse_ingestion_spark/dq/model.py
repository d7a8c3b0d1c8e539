"""DQ result model.

Parity with reference ``dq/DQ.scala:9-35``: ``DQStatus {PASS, FAIL,
WARNING}``, per-check ``DQResult(status, metrics)``, folded ``DQSummary``
whose overall status is FAIL if any FAIL else WARNING if any WARNING.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field


class DQStatus(enum.Enum):
    PASS = "PASS"
    WARNING = "WARNING"
    FAIL = "FAIL"

    @property
    def severity(self) -> int:
        return {"PASS": 0, "WARNING": 1, "FAIL": 2}[self.value]


@dataclass
class DQResult:
    check_name: str
    status: DQStatus
    metrics: dict[str, float] = field(default_factory=dict)
    message: str = ""


@dataclass
class DQSummary:
    status: DQStatus
    results: list[DQResult] = field(default_factory=list)

    @classmethod
    def fold(cls, results: list[DQResult]) -> "DQSummary":
        status = DQStatus.PASS
        for r in results:
            if r.status.severity > status.severity:
                status = r.status
        return cls(status=status, results=results)

    @property
    def failed(self) -> list[DQResult]:
        return [r for r in self.results if r.status is DQStatus.FAIL]

    @property
    def warned(self) -> list[DQResult]:
        return [r for r in self.results if r.status is DQStatus.WARNING]
