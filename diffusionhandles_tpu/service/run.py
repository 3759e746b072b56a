"""Service launcher CLI: `python -m diffusionhandles_tpu.service.run <name>`.

Names: diffhandles, pipeline, depth, remover, selector, text2img
(ports 8888-8893 parity with reference: start_webapps_in_tmux.sh:21-43).
"""

from __future__ import annotations

import argparse


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("service", choices=["diffhandles", "pipeline",
                                            "depth", "remover", "selector",
                                            "text2img"])
    parser.add_argument("--port", type=int, default=None)
    parser.add_argument("--variant", default="sd2",
                        choices=["sd2", "tiny"])
    parser.add_argument("--netpath", default="")
    args = parser.parse_args()

    from diffusionhandles_tpu.service import services, pipeline_app
    defaults = {"pipeline": 8888, "diffhandles": 8889, "depth": 8890,
                "remover": 8891, "selector": 8892, "text2img": 8893}
    port = args.port or defaults[args.service]

    if args.service == "diffhandles":
        app = services.DiffhandlesWebapp(port=port, variant=args.variant,
                                         netpath=args.netpath)
    elif args.service == "pipeline":
        app = pipeline_app.DiffhandlesPipelineWebapp(port=port,
                                                     netpath=args.netpath)
    elif args.service == "depth":
        app = services.DepthEstimatorWebapp(port=port, netpath=args.netpath)
    elif args.service == "remover":
        app = services.ForegroundRemoverWebapp(port=port,
                                               netpath=args.netpath)
    elif args.service == "selector":
        app = services.ForegroundSelectorWebapp(port=port,
                                                netpath=args.netpath)
    else:
        app = services.Text2ImgWebapp(port=port, variant=args.variant,
                                      netpath=args.netpath)
    print(f"serving {args.service} on :{port}")
    app.run()


if __name__ == "__main__":
    main()
