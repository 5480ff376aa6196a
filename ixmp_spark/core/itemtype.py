"""ItemType flags (reference backend/common.py:59–93).

An :class:`enum.IntFlag` so callers can combine kinds bitwise —
``ItemType.VAR | ItemType.EQU`` — exactly as the reference API accepts
for clone/read-excel item selection.
"""

from __future__ import annotations

from enum import IntFlag, auto


class ItemType(IntFlag):
    """Type of data items in TimeSeries and Scenario."""

    #: Time series data variable.
    TS = auto()
    #: Set.
    SET = auto()
    #: Parameter.
    PAR = auto()
    #: Model variable.
    VAR = auto()
    #: Equation.
    EQU = auto()
    #: All model-related data kinds.
    MODEL = SET | PAR | VAR | EQU
    #: Model solution data.
    SOLUTION = VAR | EQU
    #: Everything.
    ALL = TS | MODEL

    @staticmethod
    def is_model_data(value: "ItemType") -> bool:
        return bool(value & ItemType.MODEL)

    @classmethod
    def from_str(cls, s: str) -> "ItemType":
        """'set'/'par'/'var'/'equ'/'ts' → flag (the engine's internal
        lowercase ix_type strings)."""
        return cls[s.upper()]

    def ix_types(self) -> list[str]:
        """The lowercase ix_type strings this flag covers (model kinds
        only — TS has no item registry entry)."""
        return [
            t.name.lower()
            for t in (ItemType.SET, ItemType.PAR, ItemType.VAR, ItemType.EQU)
            if self & t
        ]
