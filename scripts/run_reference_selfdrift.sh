#!/usr/bin/env bash
# Reference-vs-ITSELF chaos-floor control for the energy axis
# (ENERGY_AXIS.md): run the same patched harris deck as
# run_reference_drift.sh but with the FIRST ion's ux perturbed by exactly
# one float ulp at load time.  The 10k-step |delta drift| between this run
# and the unperturbed run measures the reference's own chaotic
# decorrelation floor -- the yardstick for the repo-vs-reference delta.
#
# Usage: [DAMP=0] [NSTEPS=10000] [EINT=250] bash scripts/run_reference_selfdrift.sh <rundir>
set -e

REF=/root/reference
BUILD=/tmp/vpic_ref_build
RUN=${1:?usage: run_reference_selfdrift.sh <rundir>}
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
    -e "s|d0 = gdri\*uy + sqrt(ux\*ux+uy\*uy+uz\*uz+1)\*udri;|{ static int _n=0; if( !_n++ ) ux = (double)nextafterf( (float)ux, 3.0e38f ); } d0 = gdri*uy + sqrt(ux*ux+uy*uy+uz*uz+1)*udri;|" \
    "$REF/sample/harris" > "$RUN/harris_selfdrift.cxx"

# sanity: every sed pattern must have hit
grep -q "num_step = $NSTEPS;" "$RUN/harris_selfdrift.cxx"
grep -q "double damp      = $DAMP;" "$RUN/harris_selfdrift.cxx"
grep -q "nextafterf" "$RUN/harris_selfdrift.cxx"

"$BUILD/vpicc" "$RUN/harris_selfdrift.cxx" "$RUN/harris_selfdrift"
cd "$RUN"
echo "running SELF-DRIFT control: damp=$DAMP nsteps=$NSTEPS (energies every $EINT)"
exec nice -n 19 ./harris_selfdrift
