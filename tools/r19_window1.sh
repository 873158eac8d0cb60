#!/bin/bash
# r19 window-1 profile chain: run ALONE (each step saturates local[32]).
# Launch: setsid bash tools/r19_window1.sh > /tmp/r19_w1.log 2>&1 &
cd /root/repo
run() { # run <tag> <sbt main + args...>
  date
  echo "=== $1 ==="
  shift
  sbt -batch "runMain $*" 2>&1 | grep -E "\[(pdisk|tld|pad|pms|pshard)\]|\"metric\"|Exception|FAILED|OutOfMemory"
}
date
echo "=== BENCH sf0.1 ==="
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  sbt -batch "runMain graft.Bench" 2>&1 | grep '"metric"'
SPARK_DRIVER_MEM=48g run "ProfilePackedDisk 5M" graft.ProfilePackedDisk 5000000 2048
SPARK_DRIVER_MEM=48g run "ProfileTwoLevelDist 20M" graft.ProfileTwoLevelDist 20000000 2048 100000 4 4
SPARK_DRIVER_MEM=48g run "ProfileAutoDial 20M" graft.ProfileAutoDial 20000000 2048 100000
SPARK_DRIVER_MEM=48g run "ProfileMaintServe 20M" graft.ProfileMaintServe 20000000 4 100000 1024 5000
SPARK_DRIVER_MEM=96g run "ProfileSharded 80M fp16only" graft.ProfileSharded 80000000 16 100000 1024 2:32,2:48 fp16only
date
echo "=== WINDOW 1 DONE ==="
