package it.unimi.dsi.fastutil.longs;

import java.util.Arrays;

/**
 * Minimal shim providing just the fastutil LongArrayList surface the
 * reference writer slice uses (Way.getRefs consumers in O5mMapWriter /
 * OSMXMLWriter), so the format writers can be compiled and EXECUTED for
 * the differential golden test without the real fastutil jar (offline
 * sandbox). API-compatible stand-in written from scratch — behaviourally
 * a plain growable long array.
 */
public class LongArrayList implements Iterable<Long> {
    private long[] a;
    private int size;

    public LongArrayList() { this(16); }

    public LongArrayList(int capacity) { a = new long[Math.max(1, capacity)]; }

    public LongArrayList(LongArrayList other) {
        a = Arrays.copyOf(other.a, Math.max(1, other.size));
        size = other.size;
    }

    public boolean add(long v) {
        if (size == a.length) a = Arrays.copyOf(a, a.length * 2);
        a[size++] = v;
        return true;
    }

    public long getLong(int idx) {
        if (idx >= size) throw new IndexOutOfBoundsException(idx + " >= " + size);
        return a[idx];
    }

    /** fastutil's deprecated boxing accessor; the XML writer calls it. */
    public long get(int idx) { return getLong(idx); }

    public int size() { return size; }

    public boolean isEmpty() { return size == 0; }

    public void clear() { size = 0; }

    public long[] toLongArray() { return Arrays.copyOf(a, size); }

    public boolean contains(long v) {
        for (int i = 0; i < size; i++) if (a[i] == v) return true;
        return false;
    }

    @Override
    public java.util.Iterator<Long> iterator() {
        return new java.util.Iterator<Long>() {
            private int i;
            @Override public boolean hasNext() { return i < size; }
            @Override public Long next() { return a[i++]; }
        };
    }
}
