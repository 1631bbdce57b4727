"""Sample /proc/stat once per second; print ts, busy%, steal% (of full
32-cpu capacity).  Run alongside a bench to correlate slow queries with
host-steal bursts."""
import sys
import time


def read():
    with open("/proc/stat") as f:
        p = f.readline().split()
    # user nice system idle iowait irq softirq steal
    vals = list(map(int, p[1:9]))
    busy = vals[0] + vals[1] + vals[2] + vals[5] + vals[6]
    return busy, vals[7], sum(vals)


prev = read()
while True:
    time.sleep(1)
    cur = read()
    db = cur[0] - prev[0]
    ds = cur[1] - prev[1]
    dt = cur[2] - prev[2]
    if dt > 0:
        print(f"{time.time():.0f} busy={db/dt*100:5.1f}% steal={ds/dt*100:5.2f}%",
              flush=True)
    prev = cur
