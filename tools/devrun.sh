#!/bin/sh
# Run a heavy dev command without polluting an in-flight scaling trial:
# mark the dev shell busy (so tools/quiet_capture.py won't fire a pair),
# wait for any running trial pair to finish, then run.
set -e
touch /tmp/graft_dev_busy
trap 'rm -f /tmp/graft_dev_busy' EXIT
while [ -e /tmp/graft_trial_running ]; do sleep 5; done
# the flag belongs to this shell: a child bench.py must not wait on it
SPARK_GRAFT_DEV_PARENT=1 "$@"
