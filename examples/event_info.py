"""
Inspecting an events file (cf. reference ``pisa_examples/event_info.ipynb``):
load a PISA events HDF5 with EventsPi, look at categories, variables, and
basic distributions.
"""

import numpy as np

from pisa_tpu.core.events_pi import EventsPi


def main():
    events = EventsPi(name="toy events")
    events.load_events_file(
        "events/events__vlvnt__toy_1_to_80GeV_spidx1.0_cz-1_to_1_1e2evts"
        "_set0__unjoined__with_fluxes_honda-2015-spl-solmin-aa.hdf5"
    )
    print("categories:", list(events.keys()))
    for name, table in events.items():
        n = len(table["true_energy"])
        emin, emax = table["true_energy"].min(), table["true_energy"].max()
        print(f"  {name}: {n} events, E in [{emin:.2f}, {emax:.1f}] GeV")
    # simple derived quantity: per-category mean weighted aeff
    for name, table in events.items():
        if "weighted_aeff" in table:
            print(f"  {name}: <weighted_aeff> = {np.mean(table['weighted_aeff']):.3e}")
            break
    return events


if __name__ == "__main__":
    main()
