"""Typed response models — the reference's ``responses.py:1-58`` wire
surface as stdlib dataclasses (the container ships no pydantic).

The reference annotates ``/analyze`` with ``AnalyticsResponse``
(app.py:20, 97): correlations keyed by id, each carrying diagnostics
(grain + from/to index windows), regressor coefficients, and
historical/future prediction records. ``from_payload`` constructors
validate an engine response dict against that surface — used by the
server tests to assert every fixture response conforms — while
tolerating the engine's documented additive extensions
(autocorrelations, grangerCausality, quantile columns).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

#: grains the reference enum admits (app.py:39); "min" is our accepted
#: alias for the reference's "m" spelling (core.py:34)
_UNITS = ("D", "W", "M", "H", "m", "min")


class ResponseValidationError(ValueError):
    """A response payload does not match the reference wire surface."""


def _require(payload: dict, key: str, where: str) -> Any:
    if key not in payload:
        raise ResponseValidationError(f"{where}: missing field {key!r}")
    return payload[key]


def _number(value: Any, where: str) -> float:
    if value is None or isinstance(value, bool) or not isinstance(value, (int, float)):
        raise ResponseValidationError(f"{where}: expected number, got {value!r}")
    return float(value)


@dataclass
class IndexResponse:
    """reference responses.py:6-10 (plus our data/index echo)."""

    minDate: Any
    maxDate: Any
    unitsForecasted: int

    @classmethod
    def from_payload(cls, payload: dict, where: str) -> "IndexResponse":
        units = _require(payload, "unitsForecasted", where)
        if not isinstance(units, int) or isinstance(units, bool) or units < 1:
            raise ResponseValidationError(
                f"{where}.unitsForecasted: expected int >= 1, got {units!r}"
            )
        return cls(
            minDate=_require(payload, "minDate", where),
            maxDate=_require(payload, "maxDate", where),
            unitsForecasted=units,
        )


@dataclass
class DiagnosticsResponse:
    """reference responses.py:13-16."""

    units: str
    from_: IndexResponse
    to: IndexResponse

    @classmethod
    def from_payload(cls, payload: dict, where: str) -> "DiagnosticsResponse":
        units = _require(payload, "units", where)
        if units not in _UNITS:
            raise ResponseValidationError(f"{where}.units: {units!r} not in {_UNITS}")
        return cls(
            units=units,
            from_=IndexResponse.from_payload(
                _require(payload, "from", where), f"{where}.from"
            ),
            to=IndexResponse.from_payload(
                _require(payload, "to", where), f"{where}.to"
            ),
        )


@dataclass
class Prediction:
    """reference responses.py:19-33 — date + prediction band. The
    reference's Prophet emits trend/additive-terms columns; our native
    backend emits the prediction band (and trend via the changepoint
    path), so only the band triple is required here."""

    date: Any
    prediction: float
    prediction_lower_bound: float | None = None
    prediction_upper_bound: float | None = None

    @classmethod
    def from_payload(cls, payload: dict, where: str) -> "Prediction":
        pred = _number(_require(payload, "prediction", where), f"{where}.prediction")
        lo = payload.get("prediction_lower_bound")
        hi = payload.get("prediction_upper_bound")
        if (lo is None) != (hi is None):
            raise ResponseValidationError(f"{where}: one-sided prediction band")
        if lo is not None:
            lo = _number(lo, f"{where}.prediction_lower_bound")
            hi = _number(hi, f"{where}.prediction_upper_bound")
            # only lo <= hi: residual-quantile bands legitimately sit
            # one-sided of yhat when the model's residuals are skewed
            if lo > hi:
                raise ResponseValidationError(f"{where}: inverted band")
        return cls(
            date=_require(payload, "date", where),
            prediction=pred,
            prediction_lower_bound=lo,
            prediction_upper_bound=hi,
        )


@dataclass
class Predictions:
    """reference responses.py:36-38."""

    historicalForecasts: list[Prediction]
    futureForecasts: list[Prediction]

    @classmethod
    def from_payload(cls, payload: dict, where: str) -> "Predictions":
        return cls(
            historicalForecasts=[
                Prediction.from_payload(r, f"{where}.historicalForecasts[{i}]")
                for i, r in enumerate(_require(payload, "historicalForecasts", where))
            ],
            futureForecasts=[
                Prediction.from_payload(r, f"{where}.futureForecasts[{i}]")
                for i, r in enumerate(_require(payload, "futureForecasts", where))
            ],
        )


@dataclass
class RegressorCoefficient:
    """reference responses.py:41-47 (regressor + coef; bounds optional
    in the native backend)."""

    regressor: str
    coef: float | None

    @classmethod
    def from_payload(cls, payload: dict, where: str) -> "RegressorCoefficient":
        reg = _require(payload, "regressor", where)
        if not isinstance(reg, str):
            raise ResponseValidationError(f"{where}.regressor: not a string")
        coef = payload.get("coef")
        if coef is not None:
            coef = _number(coef, f"{where}.coef")
        return cls(regressor=reg, coef=coef)


@dataclass
class CorrelationResponse:
    """reference responses.py:50-54."""

    type: str
    diagnostics: DiagnosticsResponse
    regressorCoefficients: list[RegressorCoefficient] = field(default_factory=list)
    predictions: Predictions | None = None

    @classmethod
    def from_payload(cls, payload: dict, where: str) -> "CorrelationResponse":
        ctype = _require(payload, "type", where)
        diagnostics = DiagnosticsResponse.from_payload(
            _require(payload, "diagnostics", where), f"{where}.diagnostics"
        )
        coeffs = [
            RegressorCoefficient.from_payload(r, f"{where}.regressorCoefficients[{i}]")
            for i, r in enumerate(payload.get("regressorCoefficients", []))
        ]
        predictions = None
        if ctype == "prophet":
            # the prophet type REQUIRES predictions (reference app.py:97
            # return contract); other correlation types emit their own
            # sections (grangerCausality, statistics) instead
            predictions = Predictions.from_payload(
                _require(payload, "predictions", where), f"{where}.predictions"
            )
        return cls(
            type=ctype,
            diagnostics=diagnostics,
            regressorCoefficients=coeffs,
            predictions=predictions,
        )


@dataclass
class AnalyticsResponse:
    """reference responses.py:57-58 — the `/analyze` envelope."""

    correlations: dict[str, CorrelationResponse]

    @classmethod
    def from_payload(cls, payload: dict) -> "AnalyticsResponse":
        corr = _require(payload, "correlations", "response")
        if not isinstance(corr, dict):
            raise ResponseValidationError("response.correlations: not an object")
        return cls(
            correlations={
                name: CorrelationResponse.from_payload(p, f"correlations[{name}]")
                for name, p in corr.items()
            }
        )


def validate_analytics_response(payload: dict) -> AnalyticsResponse:
    """Validate an `/analyze` response dict against the reference wire
    surface; raises ResponseValidationError with a field path on any
    violation."""
    return AnalyticsResponse.from_payload(payload)
