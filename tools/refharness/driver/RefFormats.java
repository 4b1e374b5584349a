package graft.refharness;

import java.io.BufferedReader;
import java.io.File;
import java.io.FileInputStream;
import java.io.IOException;
import java.io.PrintWriter;
import java.nio.channels.FileChannel;
import java.nio.charset.StandardCharsets;
import java.nio.file.Files;
import java.nio.file.Paths;
import java.util.List;
import java.util.concurrent.BlockingQueue;

import uk.me.parabola.splitter.Area;
import uk.me.parabola.splitter.Element;
import uk.me.parabola.splitter.MapProcessor;
import uk.me.parabola.splitter.Node;
import uk.me.parabola.splitter.OSMMessage;
import uk.me.parabola.splitter.Relation;
import uk.me.parabola.splitter.Way;
import uk.me.parabola.splitter.parser.O5mMapParser;
import uk.me.parabola.splitter.writer.AbstractOSMWriter;
import uk.me.parabola.splitter.writer.O5mMapWriter;
import uk.me.parabola.splitter.writer.OSMXMLWriter;

/**
 * Differential-test driver around the REFERENCE format codecs (compiled
 * unmodified from /root/reference with the compile-only shims): drives
 * the genuine O5mMapWriter / OSMXMLWriter over a canonical entity dump,
 * and the genuine O5mMapParser over an o5m file back into the same dump
 * form, so the Scala codecs' bytes and parses can be compared against
 * the real article (RefFormatParitySpec).
 *
 * Dump line protocol (tab-separated, fields escaped \\ \t \n \r):
 *   B <minLatMU> <minLonMU> <maxLatMU> <maxLonMU>     (map units)
 *   N <id> <version> <lat7> <lon7> [k v]...
 *   W <id> <version> <nrefs> <ref>... [k v]...
 *   R <id> <version> <nmem> [<type> <ref> <role>]... [k v]...
 *
 * Usage:
 *   RefFormats write-o5m|write-xml <dump> <outDir> <mapId>
 *              <keep|fake|remove> <minLatMU> <minLonMU> <maxLatMU> <maxLonMU>
 *   RefFormats parse-o5m <file.o5m> <out.dump>
 */
public final class RefFormats {
    private RefFormats() {}

    static String esc(String s) {
        StringBuilder b = new StringBuilder(s.length() + 4);
        for (int i = 0; i < s.length(); i++) {
            char c = s.charAt(i);
            if (c == '\\') b.append("\\\\");
            else if (c == '\t') b.append("\\t");
            else if (c == '\n') b.append("\\n");
            else if (c == '\r') b.append("\\r");
            else b.append(c);
        }
        return b.toString();
    }

    static String unesc(String s) {
        StringBuilder b = new StringBuilder(s.length());
        for (int i = 0; i < s.length(); i++) {
            char c = s.charAt(i);
            if (c == '\\' && i + 1 < s.length()) {
                char n = s.charAt(++i);
                if (n == 't') b.append('\t');
                else if (n == 'n') b.append('\n');
                else if (n == 'r') b.append('\r');
                else b.append(n);
            } else b.append(c);
        }
        return b.toString();
    }

    /**
     * A degrees double whose o5m truncation (int)(d*1e7) AND XML
     * rounding Math.round(d*1e7) both recover the exact 1e-7 integer —
     * the two conversions the reference writers apply to Node doubles.
     */
    static double coord(long v7) {
        double v = v7 / 1e7;
        if (v7 >= 0) while ((long) (v * 1e7) < v7) v = Math.nextUp(v);
        else while ((long) (v * 1e7) > v7) v = Math.nextDown(v);
        if ((long) (v * 1e7) != v7 || Math.round(v * 1e7) != v7)
            throw new IllegalStateException("no exact double for " + v7);
        return v;
    }

    private static void write(String fmt, String dumpFile, File outDir, int mapId,
            String policy, int minLat, int minLon, int maxLat, int maxLon) throws IOException {
        Area bounds = new Area(minLat, minLon, maxLat, maxLon);
        AbstractOSMWriter w = "o5m".equals(fmt)
                ? new O5mMapWriter(bounds, outDir, mapId, 0)
                : new OSMXMLWriter(bounds, outDir, mapId, 0);
        int method = "remove".equals(policy) ? AbstractOSMWriter.REMOVE_VERSION
                : "fake".equals(policy) ? AbstractOSMWriter.FAKE_VERSION
                : AbstractOSMWriter.KEEP_VERSION;
        w.setVersionMethod(method);
        w.initForWrite();
        try (BufferedReader r = Files.newBufferedReader(Paths.get(dumpFile), StandardCharsets.UTF_8)) {
            String line;
            while ((line = r.readLine()) != null) {
                if (line.isEmpty()) continue;
                String[] f = line.split("\t", -1);
                switch (f[0]) {
                case "B":
                    break; // bounds come from the Area argument
                case "N": {
                    Node n = new Node();
                    n.set(Long.parseLong(f[1]), coord(Long.parseLong(f[3])),
                            coord(Long.parseLong(f[4])));
                    n.setVersion(Integer.parseInt(f[2]));
                    for (int i = 5; i + 1 < f.length; i += 2)
                        n.addTag(unesc(f[i]), unesc(f[i + 1]));
                    w.write(n);
                    break;
                }
                case "W": {
                    Way way = new Way();
                    way.set(Long.parseLong(f[1]));
                    way.setVersion(Integer.parseInt(f[2]));
                    int nRefs = Integer.parseInt(f[3]);
                    for (int i = 0; i < nRefs; i++)
                        way.addRef(Long.parseLong(f[4 + i]));
                    for (int i = 4 + nRefs; i + 1 < f.length; i += 2)
                        way.addTag(unesc(f[i]), unesc(f[i + 1]));
                    w.write(way);
                    break;
                }
                case "R": {
                    Relation rel = new Relation();
                    rel.setId(Long.parseLong(f[1]));
                    rel.setVersion(Integer.parseInt(f[2]));
                    int nMem = Integer.parseInt(f[3]);
                    int p = 4;
                    for (int i = 0; i < nMem; i++, p += 3)
                        rel.addMember(f[p], Long.parseLong(f[p + 1]), unesc(f[p + 2]));
                    for (; p + 1 < f.length; p += 2)
                        rel.addTag(unesc(f[p]), unesc(f[p + 1]));
                    w.write(rel);
                    break;
                }
                default:
                    throw new IllegalArgumentException("bad dump line: " + line);
                }
            }
        }
        w.finishWrite();
    }

    /** MapProcessor that dumps every callback in canonical form. */
    private static final class Dumper implements MapProcessor {
        final PrintWriter out;
        Dumper(PrintWriter out) { this.out = out; }

        @Override public boolean skipTags() { return false; }
        @Override public boolean skipNodes() { return false; }
        @Override public boolean skipWays() { return false; }
        @Override public boolean skipRels() { return false; }
        @Override public int getPhase() { return 1; }

        @Override public void boundTag(Area b) {
            out.println("B\t" + b.getMinLat() + "\t" + b.getMinLong()
                    + "\t" + b.getMaxLat() + "\t" + b.getMaxLong());
        }

        private String tags(Element el) {
            StringBuilder b = new StringBuilder();
            for (java.util.Iterator<Element.Tag> it = el.tagsIterator(); it.hasNext();) {
                Element.Tag t = it.next();
                b.append('\t').append(esc(t.getKey())).append('\t').append(esc(t.getValue()));
            }
            return b.toString();
        }

        @Override public void processNode(Node n) {
            out.println("N\t" + n.getId() + "\t" + n.getVersion()
                    + "\t" + Math.round(n.getLat() * 1e7)
                    + "\t" + Math.round(n.getLon() * 1e7) + tags(n));
        }

        @Override public void processWay(Way w) {
            StringBuilder b = new StringBuilder();
            b.append("W\t").append(w.getId()).append('\t').append(w.getVersion())
                    .append('\t').append(w.getRefs().size());
            for (int i = 0; i < w.getRefs().size(); i++)
                b.append('\t').append(w.getRefs().getLong(i));
            out.println(b + tags(w));
        }

        @Override public void processRelation(Relation r) {
            List<Relation.Member> ms = r.getMembers();
            StringBuilder b = new StringBuilder();
            b.append("R\t").append(r.getId()).append('\t').append(r.getVersion())
                    .append('\t').append(ms.size());
            for (Relation.Member m : ms)
                b.append('\t').append(m.getType()).append('\t').append(m.getRef())
                        .append('\t').append(esc(m.getRole()));
            out.println(b + tags(r));
        }

        @Override public boolean endMap() { return true; }
        @Override public boolean consume(BlockingQueue<OSMMessage> queue) { return false; }
        @Override public void startFile() {}
    }

    private static void parseO5m(String file, String outDump) throws IOException {
        try (PrintWriter out = new PrintWriter(new File(outDump), "UTF-8");
             FileInputStream fis = new FileInputStream(file);
             FileChannel fc = fis.getChannel()) {
            O5mMapParser parser = new O5mMapParser(new Dumper(out), fc, null);
            parser.parse();
        }
    }

    /** Count-only processor: parse throughput measurement without the
     * dump's PrintWriter I/O skewing the timing. */
    private static final class Counter implements MapProcessor {
        long nodes, ways, rels;
        @Override public boolean skipTags() { return false; }
        @Override public boolean skipNodes() { return false; }
        @Override public boolean skipWays() { return false; }
        @Override public boolean skipRels() { return false; }
        @Override public int getPhase() { return 1; }
        @Override public void boundTag(Area b) {}
        @Override public void processNode(Node n) { nodes++; }
        @Override public void processWay(Way w) { ways++; }
        @Override public void processRelation(Relation r) { rels++; }
        @Override public boolean endMap() { return true; }
        @Override public boolean consume(BlockingQueue<OSMMessage> queue) { return false; }
        @Override public void startFile() {}
    }

    /** count-o5m <file.o5m> <rounds>: parse with the genuine reference
     * parser, print per-round wall seconds + entity counts. */
    private static void countO5m(String file, int rounds) throws IOException {
        for (int r = 0; r < rounds; r++) {
            Counter c = new Counter();
            long t0 = System.nanoTime();
            try (FileInputStream fis = new FileInputStream(file);
                 FileChannel fc = fis.getChannel()) {
                new O5mMapParser(c, fc, null).parse();
            }
            double sec = (System.nanoTime() - t0) / 1e9;
            System.out.println("COUNT " + sec + " " + c.nodes + " " + c.ways
                    + " " + c.rels);
        }
    }

    public static void main(String[] args) throws Exception {
        switch (args[0]) {
        case "write-o5m":
        case "write-xml":
            write(args[0].substring(6), args[1], new File(args[2]),
                    Integer.parseInt(args[3]), args[4],
                    Integer.parseInt(args[5]), Integer.parseInt(args[6]),
                    Integer.parseInt(args[7]), Integer.parseInt(args[8]));
            break;
        case "parse-o5m":
            parseO5m(args[1], args[2]);
            break;
        case "count-o5m":
            countO5m(args[1], args.length > 2 ? Integer.parseInt(args[2]) : 3);
            break;
        default:
            throw new IllegalArgumentException("unknown mode " + args[0]);
        }
    }
}
