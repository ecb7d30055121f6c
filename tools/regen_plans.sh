#!/bin/bash
# Regenerate PLANS.md from the live Catalyst plans (Catalog.plannedNames).
# Run from the repo root after the last code commit of a round; commit the
# refreshed PLANS.md. PlansDocSpec fails `sbt test` while the doc is stale.
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch compile
spark-shell -cp target/scala-2.13/classes -i tools/dump_plans.scala < /dev/null
