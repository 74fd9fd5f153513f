#!/usr/bin/env python
"""Visualization demo — the InstaOrder_vis.ipynb equivalent as a script.

Renders instance masks plus occlusion/depth order graphs for a few images
of an InstaOrder-format dataset (real or the synthetic fixture when no
--annot is given).

Usage:
  python tools/visualize_demo.py [--annot InstaOrder_val2017.json
      --instances instances_val2017.json --image-root val2017]
      [--out out_vis] [--n 4]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--annot', default=None)
    ap.add_argument('--instances', default=None)
    ap.add_argument('--image-root', default=None)
    ap.add_argument('--out', default='out_vis')
    ap.add_argument('--n', type=int, default=4)
    args = ap.parse_args()

    import matplotlib
    matplotlib.use('Agg')
    import matplotlib.pyplot as plt
    import numpy as np
    from PIL import Image

    from instaorder_tpu.data.readers import InstaOrderReader
    from instaorder_tpu.utils.visualize import (draw_graph,
                                                get_mid_top_from_masks,
                                                put_instance_mask_and_ID)

    if args.annot is None:
        import tempfile
        from instaorder_tpu.data.synthetic import make_instaorder_fixture
        root = tempfile.mkdtemp()
        args.annot, args.instances, args.image_root = \
            make_instaorder_fixture(root)
        print(f'(no --annot given: rendering the synthetic fixture '
              f'at {root})')

    reader = InstaOrderReader(args.annot, args.instances)
    os.makedirs(args.out, exist_ok=True)
    n = min(args.n, reader.get_image_length())
    for i in range(n):
        modal, cat, bboxes, _, fn = reader.get_image_instances(i)
        image = np.array(Image.open(
            os.path.join(args.image_root, fn)).convert('RGB'))
        occ = reader.get_gt_ordering(i, 'occlusion')
        depth, overlap, count = reader.get_gt_ordering(i, 'depth')
        overlay = put_instance_mask_and_ID(
            image, modal, get_mid_top_from_masks(modal))

        fig = plt.figure(figsize=(15, 5))
        ax = fig.add_subplot(131)
        ax.imshow(overlay)
        ax.set_title(fn)
        ax.set_axis_off()
        ax2 = fig.add_subplot(132)
        draw_graph(occ, ax=ax2)
        ax2.set_title('occlusion order (i -> j: i over j)')
        ax3 = fig.add_subplot(133)
        draw_graph(np.where(depth == -1, 0, depth), overlap, ax=ax3)
        ax3.set_title('depth order (i -> j: i closer)')
        out_path = os.path.join(args.out, f'{i:04d}.png')
        fig.savefig(out_path, bbox_inches='tight', dpi=110)
        plt.close(fig)
        print('wrote', out_path)


if __name__ == '__main__':
    main()
