"""Request models — the reference's wire surface, re-specified.

Reference: pydantic models at app.py:31-67 (``/analyze``) and
app.py:253-310 (``/saturating-growth``). This container ships no
pydantic, so these are dataclasses with explicit camelCase alias
parsing and the same validation rules:

* correlation type enum: prophet | granger | univariateStatistics
  (app.py:33)
* grain enum D|W|M|H|min (app.py:39) — we also accept "m" (the
  reference's own bucketer matched only "m", core.py:34; SURVEY T7)
* aggregation enum incl. the accepted "meadian" typo (app.py:44-48)
* prediction horizon ≥ 1 when given (app.py:49)
* Cap.floor defaults to 0, ceiling None → auto (app.py:253-255)
* growth enum linear|logistic; logistic is the saturating default
  (app.py:263-267)
"""

from __future__ import annotations

from dataclasses import dataclass, field

from temporal_retriever_spark.aggregate import normalize_aggregation
from temporal_retriever_spark.grains import normalize_grain

_CORRELATION_TYPES = ("prophet", "granger", "univariateStatistics")
_GROWTH = ("linear", "logistic")

DEFAULT_QUANTILES = (0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95)


@dataclass(frozen=True)
class Cap:
    floor: float | None = 0.0
    ceiling: float | None = None


@dataclass(frozen=True)
class ForecastOptions:
    uncertainty_samples: int = 1000
    changepoint_prior_scale: float = 0.5
    growth: str = "logistic"
    from_cap: Cap = field(default_factory=Cap)
    to_cap: Cap = field(default_factory=Cap)
    #: True when changepointPriorScale appeared in the request body —
    #: selects the piecewise changepoint trend (README DIVERGENCES #9)
    changepoint_prior_scale_provided: bool = False

    def __post_init__(self):
        if self.growth not in _GROWTH:
            raise ValueError(f"unsupported growth: {self.growth!r}")
        # 0 is Prophet's "no uncertainty intervals" setting, honored
        # (the reference forwards it to Prophet, app.py:124-131)
        if self.uncertainty_samples < 0:
            raise ValueError("uncertaintySamples must be >= 0")
        if self.changepoint_prior_scale <= 0:
            raise ValueError("changepointPriorScale must be > 0")


@dataclass(frozen=True)
class Correlation:
    id: str
    from_data: str
    from_index: str
    to_data: str
    to_index: str
    type: str = "prophet"
    grain: str = "D"
    aggregation: str = "sum"
    prediction_horizon: int | None = None
    quantiles: tuple[float, ...] = DEFAULT_QUANTILES
    changepoint_prior_scale: float = 0.8
    #: True when ChangePointPriorScale appeared in the request body
    changepoint_prior_scale_provided: bool = False
    forecast_options: ForecastOptions | None = None

    def __post_init__(self):
        if self.type not in _CORRELATION_TYPES:
            raise ValueError(f"unsupported correlation type: {self.type!r}")
        if self.changepoint_prior_scale <= 0:
            raise ValueError("ChangePointPriorScale must be > 0")
        normalize_grain(self.grain)  # raises on junk
        normalize_aggregation(self.aggregation)
        if self.prediction_horizon is not None and self.prediction_horizon < 1:
            raise ValueError("unitsToForecast must be >= 1")


@dataclass(frozen=True)
class AnalyzeRequest:
    documents: dict
    correlations: tuple[Correlation, ...]


def _parse_cap(raw: dict | None) -> Cap:
    raw = raw or {}
    return Cap(floor=raw.get("floor", 0.0), ceiling=raw.get("ceiling"))


def _parse_forecast_options(raw: dict | None) -> ForecastOptions:
    raw = raw or {}
    caps = raw.get("caps") or {}
    return ForecastOptions(
        uncertainty_samples=raw.get("uncertaintySamples", 1000),
        changepoint_prior_scale=raw.get("changepointPriorScale", 0.5),
        growth=raw.get("growth", "logistic"),
        from_cap=_parse_cap(caps.get("fromIndex")),
        to_cap=_parse_cap(caps.get("toIndex")),
        changepoint_prior_scale_provided="changepointPriorScale" in raw,
    )


class RequestValidationError(ValueError):
    """FastAPI-style validation failure.

    Carries pydantic-v2-shaped error entries (``loc``/``msg``/``type``)
    so the HTTP façade can emit the same 422 body FastAPI's
    RequestValidationError handler produces (reference app.py:31-67's
    pydantic models surface errors this way)."""

    def __init__(self, errors: list[dict]):
        self.errors = errors
        super().__init__("; ".join(str(e.get("msg", "")) for e in errors))


#: wire fields pydantic marks required on the Correlation model
_REQUIRED_CORRELATION_FIELDS = ("id", "fromData", "fromIndex", "toData", "toIndex")


def parse_correlation(raw: dict, *, loc_prefix: tuple = ("body",)) -> Correlation:
    """camelCase wire names -> Correlation (aliases from app.py:34-58)."""
    missing = [f for f in _REQUIRED_CORRELATION_FIELDS if f not in raw]
    if missing:
        raise RequestValidationError(
            [
                {"loc": [*loc_prefix, f], "msg": "Field required", "type": "missing"}
                for f in missing
            ]
        )
    fopts = raw.get("ForecastingOptions") or raw.get("forecastingOptions")
    # the saturating endpoint nests per-leg options; flatten the to-leg
    # scale/growth onto the correlation. Cap selection mirrors the
    # reference exactly (app.py:513-517, 533-537): the covariate leg is
    # clamped by fromIndex-options' caps.fromIndex and the target leg by
    # toIndex-options' caps.toIndex.
    parsed_fopts = None
    if fopts is not None:
        to_leg = _parse_forecast_options(fopts.get("toIndex"))
        from_leg = _parse_forecast_options(fopts.get("fromIndex"))
        parsed_fopts = ForecastOptions(
            uncertainty_samples=to_leg.uncertainty_samples,
            changepoint_prior_scale=to_leg.changepoint_prior_scale,
            growth=to_leg.growth,
            from_cap=from_leg.from_cap,
            to_cap=to_leg.to_cap,
            changepoint_prior_scale_provided=(
                to_leg.changepoint_prior_scale_provided
            ),
        )
    return Correlation(
        id=raw["id"],
        type=raw.get("type", "prophet"),
        from_data=raw["fromData"],
        from_index=raw["fromIndex"],
        to_data=raw["toData"],
        to_index=raw["toIndex"],
        grain=raw.get("dataSetGranularity", "D"),
        aggregation=raw.get("dataAggregationType", "sum"),
        prediction_horizon=raw.get("unitsToForecast"),
        quantiles=tuple(raw.get("predictionQuantiles", DEFAULT_QUANTILES)),
        changepoint_prior_scale=raw.get("ChangePointPriorScale", 0.8),
        changepoint_prior_scale_provided="ChangePointPriorScale" in raw,
        forecast_options=parsed_fopts,
    )


def parse_analyze_request(body: dict) -> AnalyzeRequest:
    """Parse a request body in either canonical or notebook layout.

    Canonical (app.py:65-67): ``{"documents": {...},
    "analyticsOptions": {"correlations": [...]}}``. The
    electricity_demand.json fixture instead puts each document at the
    top level next to ``analyticsOptions`` — accepted too.
    """
    options = body.get("analyticsOptions") or {}
    errors: list[dict] = []
    correlations = []
    for i, c in enumerate(options.get("correlations", [])):
        try:
            correlations.append(
                parse_correlation(
                    c,
                    loc_prefix=("body", "analyticsOptions", "correlations", i),
                )
            )
        except RequestValidationError as exc:
            # pydantic collects errors across all items before failing
            errors.extend(exc.errors)
    if errors:
        raise RequestValidationError(errors)
    if "documents" in body:
        documents = body["documents"]
    else:
        documents = {
            k: v for k, v in body.items() if k != "analyticsOptions"
        }
    if not correlations:
        raise RequestValidationError(
            [
                {
                    "loc": ["body", "analyticsOptions", "correlations"],
                    "msg": "request has no correlations",
                    "type": "value_error",
                }
            ]
        )
    return AnalyzeRequest(documents=documents, correlations=tuple(correlations))
