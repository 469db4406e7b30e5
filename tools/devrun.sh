#!/bin/sh
# Run a heavy dev command without polluting an in-flight scaling trial:
# mark the dev shell busy (so tools/quiet_capture.py won't fire a pair),
# wait for any running trial pair to finish, then run.
#
# Claim order matters: touching the dev flag FIRST (the old behavior)
# aborts unsaved any pair that fired in the seconds before the touch —
# one quiet local8 window was lost exactly that way. Instead: wait for
# any in-flight pair, claim the flag, then grace-check; if a pair won
# the race (TRIAL_FLAG appeared around our claim), yield the flag back
# so the pair completes SAVED, wait it out, and retry the claim.
set -e
# install the cleanup trap BEFORE the first touch (ADVICE r05): an
# interrupt during the grace sleep or the retry sleep must not leave the
# flag behind (a stale flag stalls subsequent bench runs for up to
# DEV_WAIT_SEC); the trap is a no-op until the flag exists.
trap 'rm -f /tmp/graft_dev_busy' EXIT
while :; do
    while [ -e /tmp/graft_trial_running ]; do sleep 5; done
    touch /tmp/graft_dev_busy
    # grace: a pair whose fire decision raced our claim surfaces its
    # trial flag within seconds (the capture loop creates it immediately
    # on fire, before the first ~20s JVM leg)
    sleep 8
    if [ -e /tmp/graft_trial_running ]; then
        rm -f /tmp/graft_dev_busy
        sleep 5
        continue
    fi
    break
done
# the flag belongs to this shell: a child bench.py must not wait on it
SPARK_GRAFT_DEV_PARENT=1 "$@"
