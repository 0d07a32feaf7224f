#!/bin/sh
# Vendor the optional `mini3di` (+ biopython) packages the moment any
# network window exists, so the PDB->3Di converter (sketchtpu/ingest/
# pdb3di.py, matching /root/reference/src/structures.rs:14-57 via
# /root/reference/python_mini3di/3di_convert.py) runs the REAL learned
# encoder instead of the API-faithful test stand-in.
#
# Usage: scripts/vendor_mini3di.sh [wheel-dir]
#   - with network: downloads wheels into wheel-dir (default
#     vendor/wheels) and installs from there;
#   - without network but with a pre-populated wheel-dir (e.g. copied
#     onto the rig out of band): installs offline from the dir.
#
# CI runs this opportunistically (failures are non-fatal); the real-
# mini3di branch of tests/test_pdb3di_e2e.py lights up automatically
# once `import mini3di` succeeds.
set -u
DIR="${1:-$(dirname "$0")/../vendor/wheels}"
mkdir -p "$DIR"

if python -c "import mini3di" 2>/dev/null; then
    echo "mini3di already importable; nothing to do"
    exit 0
fi

if ! ls "$DIR"/mini3di*.whl >/dev/null 2>&1; then
    echo "attempting pip download into $DIR (needs network)..."
    # no pipe here: a pipe would make the exit status tail's, not pip's
    if ! pip download --quiet --dest "$DIR" mini3di biopython; then
        echo "no network and no pre-staged wheels in $DIR; leaving the"
        echo "stand-in tests in place (they cover the full production"
        echo "path except the network weights)"
        exit 1
    fi
fi

pip install --no-index --find-links "$DIR" mini3di biopython \
    && python -c "import mini3di; print('mini3di', mini3di.__version__ if hasattr(mini3di, '__version__') else 'ok')"
