#!/bin/sh
# Golden acceptance runbook: run on any machine where a reference install
# has populated ~/.cache/voicefixer/ (the build environment is zero-egress,
# so the Zenodo checkpoints are unreachable there). Writes GOLDEN.json.
# See tools/run_golden.py for the artifact schema.
exec python "$(dirname "$0")/run_golden.py" "$@"
