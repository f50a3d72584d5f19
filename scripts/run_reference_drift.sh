#!/usr/bin/env bash
# Run the reference VPIC harris deck for a 10k-step energy-drift measurement
# (BASELINE.md energy axis).  The deck is the reference's own sample/harris
# with parameters patched by sed (kept out of this repo; only the patch
# recipe is committed):
#   - num_step forced to $NSTEPS (default 10000)
#   - energies dumped every $EINT steps (default 250), all other dumps off
#   - radiation damping set to $DAMP (default 0.001 = deck default;
#     pass DAMP=0 to isolate numerical conservation)
#
# Usage: [DAMP=0] [NSTEPS=10000] [EINT=250] bash scripts/run_reference_drift.sh <rundir>
set -e

REF=/root/reference
BUILD=/tmp/vpic_ref_build
RUN=${1:?usage: run_reference_drift.sh <rundir>}
DAMP=${DAMP:-0.001}
NSTEPS=${NSTEPS:-10000}
EINT=${EINT:-250}

[ -x "$BUILD/vpicc" ] || bash "$(dirname "$0")/build_reference.sh"

mkdir -p "$RUN"
sed -e "s/num_step             = int(0.2\*taui\/(wci\*dt));/num_step = $NSTEPS;/" \
    -e "s/global->energies_interval  = status_interval;/global->energies_interval = $EINT;/" \
    -e "s/global->fields_interval    = status_interval;/global->fields_interval = 0;/" \
    -e "s/global->ehydro_interval    = status_interval;/global->ehydro_interval = 0;/" \
    -e "s/global->ihydro_interval    = status_interval;/global->ihydro_interval = 0;/" \
    -e "s/global->eparticle_interval = status_interval;/global->eparticle_interval = 0;/" \
    -e "s/global->iparticle_interval = status_interval;/global->iparticle_interval = 0;/" \
    -e "s/global->restart_interval   = status_interval;/global->restart_interval = 0;/" \
    -e "s/double damp      = 0.001;/double damp      = $DAMP;/" \
    "$REF/sample/harris" > "$RUN/harris_drift.cxx"

# sanity: every sed pattern must have hit
grep -q "num_step = $NSTEPS;" "$RUN/harris_drift.cxx"
grep -q "double damp      = $DAMP;" "$RUN/harris_drift.cxx"
grep -q "global->restart_interval = 0;" "$RUN/harris_drift.cxx"

"$BUILD/vpicc" "$RUN/harris_drift.cxx" "$RUN/harris_drift"
cd "$RUN"
echo "running: damp=$DAMP nsteps=$NSTEPS (energies every $EINT)"
exec nice -n 19 ./harris_drift
