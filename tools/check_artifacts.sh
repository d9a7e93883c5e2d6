#!/bin/sh
# Gate check for committed campaign artifacts (examples/*_tet/*.json, sim
# pkls). Campaign scripts call this after persisting results; run it by hand
# before committing artifacts. Exits non-zero when any committed artifact
# fails its quality gate.
cd "$(dirname "$0")/.." || exit 1
JAX_PLATFORMS=cpu exec python -m pytest -q \
    tests/test_campaign_artifacts.py \
    tests/test_trunk_campaign_artifacts.py \
    tests/test_plant_validation.py \
    "$@"
