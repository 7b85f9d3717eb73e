#!/bin/bash
# Run a python script on the axon TPU, retrying while the tunnel grant
# from a previous process is still being released ("Backend 'axon' is
# not in the list of known backends") or the backend reports UNAVAILABLE.
# Only FAILED runs are retried — a successful run whose output happens to
# contain one of the error tokens (e.g. in a warning) is returned as-is.
for i in $(seq 1 12); do
  out=$(timeout "${TPU_TIMEOUT:-1200}" python "$@" 2>&1)
  code=$?
  if [ $code -ne 0 ] && echo "$out" | grep -qE \
      "not in the list of known backends|TPU backend error|Unable to initialize backend 'axon'|UNAVAILABLE|response body closed|remote_compile.*(HTTP 50[23]|timed out)"; then
    sleep 20
    continue
  fi
  echo "$out"
  exit $code
done
echo "$out"
echo "tpu_run: axon backend never came up" >&2
exit 1
