package graft.refharness;

import java.io.File;
import java.util.ArrayList;
import java.util.List;

import uk.me.parabola.splitter.Area;
import uk.me.parabola.splitter.AreaList;
import uk.me.parabola.splitter.MapDetails;
import uk.me.parabola.splitter.RoundingUtils;
import uk.me.parabola.splitter.solver.DensityMap;
import uk.me.parabola.splitter.solver.PolygonDesc;
import uk.me.parabola.splitter.solver.SplittableDensityArea;

/**
 * Differential-test driver around the REFERENCE solver (compiled from
 * /root/reference sources, unmodified, with compile-only shims for the
 * absent fastutil/xmlpull jars). Feeds a densities.txt debug dump
 * through the reference's own readMap -> round -> subset ->
 * SplittableDensityArea.split pipeline (mirroring
 * solver/AreasCalculator.java:142-231 and Main.java:177-261) and writes
 * areas.list / areas.poly / template.args with the reference's own
 * writers, so the Scala engine's outputs can be byte-compared against
 * the genuine article.
 *
 * Usage: RefSolve <densities.txt> <resolution> <maxNodes> <outDir>
 *                 [numTiles] [mapid] [searchLimit] [trim(1|0)] [polygon]
 * polygon: single ring as "lon,lat;lon,lat;..." in map units (optional);
 * exercises the reference's split(List&lt;PolygonDesc&gt;) single-polygon
 * path exactly as --polygon-file would.
 */
public final class RefSolve {
    private RefSolve() {}

    private static java.awt.geom.Area parsePolygon(String spec) {
        java.awt.geom.Path2D.Double path = new java.awt.geom.Path2D.Double();
        String[] pts = spec.split(";");
        for (int i = 0; i < pts.length; i++) {
            String[] xy = pts[i].split(",");
            double lon = Double.parseDouble(xy[0]);
            double lat = Double.parseDouble(xy[1]);
            if (i == 0) path.moveTo(lon, lat); else path.lineTo(lon, lat);
        }
        path.closePath();
        return new java.awt.geom.Area(path);
    }

    public static void main(String[] args) throws Exception {
        String densities = args[0];
        int resolution = Integer.parseInt(args[1]);
        long maxNodes = Long.parseLong(args[2]);
        File outDir = new File(args[3]);
        int numTiles = args.length > 4 ? Integer.parseInt(args[4]) : -1;
        int mapId = args.length > 5 ? Integer.parseInt(args[5]) : 63240001;
        int searchLimit = args.length > 6 ? Integer.parseInt(args[6]) : 200000;
        boolean trim = args.length <= 7 || !"0".equals(args[7]);
        if (!outDir.isDirectory() && !outDir.mkdirs()) {
            throw new IllegalStateException("cannot create " + outDir);
        }

        // DensityMapCollector.java:35-38 — planet-wide grid at resolution.
        Area planet = new Area(-0x400000, -0x800000, 0x400000, 0x800000);
        DensityMap map = new DensityMap(planet, resolution);
        MapDetails details = new MapDetails();
        Area collectorBounds = map.readMap(densities, details);

        // AreasCalculator.fillDensityMap + calcAreas (lines 142-231).
        Area exactArea = collectorBounds != null ? collectorBounds : details.getBounds();
        Area rounded = RoundingUtils.round(exactArea, resolution);
        DensityMap sub = map.subset(rounded);
        System.out.println("REF_DEBUG total=" + map.getNodeCount()
                + " exact=" + exactArea + " rounded=" + rounded
                + " subTotal=" + sub.getNodeCount() + " subBounds=" + sub.getBounds());
        if (System.getenv("REF_DEBUG_CELLS") != null) {
            int shift = 24 - resolution;
            int startX = (rounded.getMinLong() - planet.getMinLong()) >>> shift;
            int startY = (rounded.getMinLat() - planet.getMinLat()) >>> shift;
            int w = rounded.getWidth() >> shift, h = rounded.getHeight() >> shift;
            int mismatches = 0;
            for (int x = 0; x < w && mismatches < 10; x++) {
                for (int y = 0; y < h && mismatches < 10; y++) {
                    int got = sub.getNodeCount(x, y);
                    int want = map.getNodeCount(startX + x, startY + y);
                    if (got != want) {
                        System.out.println("REF_DEBUG cell (" + x + "," + y + ") sub=" + got
                                + " raw=" + want + " planet=(" + (startX + x) + "," + (startY + y) + ")");
                        mismatches++;
                    }
                }
            }
        }
        SplittableDensityArea splittable =
                new SplittableDensityArea(sub, searchLimit);
        if (!splittable.hasData()) {
            throw new IllegalStateException("no data inside bounding box");
        }
        splittable.setTrim(trim);
        splittable.setMapId(mapId);
        List<Area> areas;
        if (numTiles >= 2) {
            areas = splittable.split(numTiles);
        } else {
            splittable.setMaxNodes(maxNodes);
            List<PolygonDesc> polygons = new ArrayList<>();
            if (args.length > 8 && !args[8].isEmpty()) {
                polygons.add(new PolygonDesc("poly", parsePolygon(args[8]), mapId));
            }
            areas = splittable.split(polygons);
        }

        // Main.split():236-261 — ids, names, golden files.
        AreaList areaList = new AreaList(areas, null);
        areaList.setMapIds(mapId);
        areaList.setAreaNames();
        areaList.write(new File(outDir, "areas.list").getPath());
        areaList.writePoly(new File(outDir, "areas.poly").getPath());
        areaList.writeArgsFile(new File(outDir, "template.args").getPath(), "pbf", -1);
        System.out.println("REF_SOLVE_OK areas=" + areas.size());
    }
}
