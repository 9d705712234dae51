#!/bin/bash
# Run a TPU tool with attach-retry: the axon tunnel occasionally refuses
# an attach right after another process released it (exit code 7 from
# our tools); space out and retry.
for i in 1 2 3 4; do
  "$@"
  rc=$?
  [ $rc -ne 7 ] && exit $rc
  echo "tpu attach failed (try $i); sleeping 45s" >&2
  sleep 45
done
exit 7
