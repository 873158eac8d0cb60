#!/bin/bash
# r19 window-2: second-window reproductions of every headline number.
# Launch AFTER window 1 completes (1h+ gap from its headline runs):
#   setsid bash tools/r19_window2.sh > /tmp/r19_w2.log 2>&1 &
cd /root/repo
run() { # run <tag> <sbt main + args...>
  date
  echo "=== $1 ==="
  shift
  sbt -batch "runMain $*" 2>&1 | grep --line-buffered -E "\[(pdisk|tld|pad|pms|pshard)\]|\"metric\"|Exception|FAILED|OutOfMemory"
}
date
echo "=== BENCH sf0.1 w2 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.Bench" 2>&1 | grep --line-buffered "\"metric\""
SPARK_DRIVER_MEM=48g run "ProfileTwoLevelDist 20M w2" graft.ProfileTwoLevelDist 20000000 2048 100000 4 4
SPARK_DRIVER_MEM=48g run "ProfileAutoDial 20M w2" graft.ProfileAutoDial 20000000 2048 100000
SPARK_DRIVER_MEM=48g run "ProfileMaintServe 20M w2" graft.ProfileMaintServe 20000000 4 100000 1024 5000
SPARK_DRIVER_MEM=48g run "ProfilePackedDisk 5M w2" graft.ProfilePackedDisk 5000000 2048
SPARK_DRIVER_MEM=96g run "ProfileSharded 80M fp16only w2" graft.ProfileSharded 80000000 16 100000 1024 2:32,2:48 fp16only
date
echo "=== WINDOW 2 DONE ==="
