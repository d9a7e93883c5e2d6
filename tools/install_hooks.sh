#!/bin/sh
# Install the repo's git hooks (.git/hooks is not tracked by git, so this
# must be re-run once per clone). Currently installs:
#
#   pre-commit — "gates green at HEAD" invariant: any commit that stages a
#   campaign artifact (examples/**/*.json|pkl|mat) or a gate test must pass
#   tools/check_artifacts.sh first. A commit that does not touch artifacts
#   skips the check (it cannot change gate outcomes).
#
# Bypass knob for emergencies: git commit --no-verify (don't).
set -e
cd "$(dirname "$0")/.."
mkdir -p .git/hooks
cat > .git/hooks/pre-commit <<'EOF'
#!/bin/sh
# Gates-green-at-HEAD invariant (VERDICT r4 #2): refuse to commit campaign
# artifacts that fail their own quality gates. Installed by
# tools/install_hooks.sh.
if git diff --cached --name-only | grep -qE \
    '^(examples/.*\.(json|pkl|mat)|tests/test_.*campaign.*\.py|tests/test_plant_validation\.py)$'
then
    echo "pre-commit: staged campaign artifacts -> running artifact gates"
    if ! sh tools/check_artifacts.sh -x -q; then
        echo ""
        echo "pre-commit: ARTIFACT GATES FAILED — commit refused."
        echo "Fix the campaign or quarantine the artifact (git checkout the"
        echo "last green version); bypass only with --no-verify."
        exit 1
    fi
fi
exit 0
EOF
chmod +x .git/hooks/pre-commit
echo "installed .git/hooks/pre-commit"
