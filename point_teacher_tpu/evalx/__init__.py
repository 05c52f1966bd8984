from .cocoeval import COCOStyleEval, AITOD_AREA_RNGS, aitod_evaluate  # noqa: F401
